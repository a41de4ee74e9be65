from . import cities  # noqa: F401
