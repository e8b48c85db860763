def get_github_url(*args, **kwargs):
    raise NotImplementedError('network access is not available at fixture-build time')


def get_famplex_url(*args, **kwargs):
    raise NotImplementedError('network access is not available at fixture-build time')
