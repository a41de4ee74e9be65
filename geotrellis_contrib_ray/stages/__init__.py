from . import ann, dedup, spatial, text, windows  # noqa: F401
