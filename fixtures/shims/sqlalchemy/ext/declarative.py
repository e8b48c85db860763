class _Metadata:
    def __getattr__(self, item):
        return lambda *a, **k: None


def declarative_base(**kwargs):
    class Base:
        metadata = _Metadata()

    return Base
