"""Minimal click_plugins stand-in (fixture-build only)."""


def with_plugins(plugins):
    def decorator(group):
        return group

    return decorator
