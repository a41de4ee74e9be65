from . import checkpoint, spatial_index  # noqa: F401
