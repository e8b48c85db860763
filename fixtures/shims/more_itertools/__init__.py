"""Minimal more_itertools stand-in (fixture-build only)."""
from itertools import islice


def chunked(iterable, n):
    it = iter(iterable)
    while True:
        chunk = list(islice(it, n))
        if not chunk:
            return
        yield chunk
