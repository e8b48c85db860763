from . import query  # noqa: F401


def _dummy(*args, **kwargs):
    return None


aliased = backref = relationship = scoped_session = sessionmaker = _dummy
