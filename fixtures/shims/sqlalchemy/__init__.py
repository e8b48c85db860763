"""Import-time-only sqlalchemy stand-in so the reference package can be
imported for golden-output generation (the Manager is never used at runtime
in our harness). NOT part of the shipped engine."""


def _dummy(*args, **kwargs):
    return None


Boolean = Column = Date = DateTime = ForeignKey = Integer = _dummy
LargeBinary = String = Table = Text = UniqueConstraint = Index = _dummy
and_ = or_ = exists = create_engine = inspect = _dummy


class _Func:
    def __getattr__(self, item):
        return _dummy


func = _Func()
