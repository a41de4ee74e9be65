from . import documents, raster_source, registry  # noqa: F401
