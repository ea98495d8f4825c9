from .narrow import to_narrow  # noqa: F401
