"""Minimal tqdm stand-in for running the reference parser at fixture-build
time (no progress bars needed). NOT part of the shipped engine."""


def tqdm(iterable=None, *args, **kwargs):
    if iterable is None:
        return lambda x: x
    return iterable


def trange(*args, **kwargs):
    return range(*args)
