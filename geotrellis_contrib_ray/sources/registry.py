"""Reader registry: URI scheme -> RasterSource factory.

The reference registered RasterSource implementations by URI scheme via SPI
(CHANGELOG.md:52 "SPI interface for RasterSource"; DataPath types
GeoTiffPath/GDALPath).  Here: an explicit registry the source stage consults,
extensible by users without touching engine code.
"""

from __future__ import annotations

from collections.abc import Callable
from urllib.parse import urlparse

_REGISTRY: dict[str, Callable[[str], object]] = {}


def register_scheme(scheme: str, factory: Callable[[str], object]) -> None:
    """Register a factory: ``factory(uri) -> RasterSource``."""
    _REGISTRY[scheme] = factory


def registered_schemes() -> list[str]:
    return sorted(_REGISTRY)


def source_for_uri(uri: str):
    """Resolve a RasterSource for a URI by its scheme."""
    scheme = urlparse(uri).scheme
    if scheme not in _REGISTRY:
        raise KeyError(f"no RasterSource registered for scheme {scheme!r} "
                       f"(registered: {registered_schemes()})")
    return _REGISTRY[scheme](uri)


def _synthetic_factory(uri: str):
    """Built-in scheme: synthetic://cols x rows @cell (test/bench rasters),
    e.g. synthetic://1500x1350@10."""
    from ..core.grid import Extent, GridExtent
    from .raster_source import SyntheticRasterSource

    body = urlparse(uri).netloc
    dims, cell = body.split("@")
    cols, rows = (int(v) for v in dims.split("x"))
    cw = float(cell)
    grid = GridExtent(Extent(0.0, 0.0, cols * cw, rows * cw), cw, cw, cols, rows)
    return SyntheticRasterSource(grid)


register_scheme("synthetic", _synthetic_factory)
