from . import guitarset  # noqa: F401
