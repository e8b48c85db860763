import requests  # noqa: F401  (patched by pybel.testing.mocks.mock_bel_resources)


def download(*args, **kwargs):
    raise NotImplementedError('network access is not available at fixture-build time')


def get_iso_8601_date():
    return '20200101'
