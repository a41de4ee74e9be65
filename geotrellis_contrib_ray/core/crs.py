"""CRS transforms (pyproj-free): WGS84 <-> Web Mercator + affine local CRSs.

The reference delegates to Proj4 with expensive, lock-guarded transform objects
(GeoTiffReprojectRasterSource.scala:63-69,132-134).  Here the supported CRS set
is closed-form (EPSG:4326, EPSG:3857, and parameterized local affine/metric
systems), so a ``Transformer`` is a cheap stateless pair of vectorized
functions — cached per actor (ST3) purely to mirror the engine pattern.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

R = 6378137.0  # WGS84 spherical radius used by EPSG:3857
MAX_LAT = 85.05112878

EPSG_4326 = "EPSG:4326"
EPSG_3857 = "EPSG:3857"


@dataclass(frozen=True)
class LocalAffineCRS:
    """A local metric CRS defined by an affine anchor to lon/lat:
    x = (lon - lon0) * sx, y = (lat - lat0) * sy.  Stand-in for UTM-like
    local systems in tests (FIXTURES.md §4 'EPSG:26711-like')."""

    name: str
    lon0: float
    lat0: float
    sx: float  # meters per degree lon
    sy: float  # meters per degree lat


def _lonlat_to_merc(x, y):
    lon = np.asarray(x, dtype=np.float64)
    lat = np.clip(np.asarray(y, dtype=np.float64), -MAX_LAT, MAX_LAT)
    mx = np.radians(lon) * R
    my = np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0)) * R
    return mx, my


def _merc_to_lonlat(x, y):
    mx = np.asarray(x, dtype=np.float64)
    my = np.asarray(y, dtype=np.float64)
    lon = np.degrees(mx / R)
    lat = np.degrees(2.0 * np.arctan(np.exp(my / R)) - np.pi / 2.0)
    return lon, lat


class Transformer:
    """Vectorized forward transform src->dst; ``inverse()`` flips it.

    Short-circuits to identity when src == dst, mirroring the reference's
    reproject no-op elision (RasterSourceF.scala:51-53).
    """

    def __init__(self, src, dst):
        self.src = src
        self.dst = dst

    @property
    def is_identity(self) -> bool:
        return self.src == self.dst

    def inverse(self) -> "Transformer":
        return Transformer(self.dst, self.src)

    def transform(self, x, y):
        if self.is_identity:
            return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
        lon, lat = _to_lonlat(self.src, x, y)
        return _from_lonlat(self.dst, lon, lat)


def _to_lonlat(crs, x, y):
    if crs == EPSG_4326:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if crs == EPSG_3857:
        return _merc_to_lonlat(x, y)
    if isinstance(crs, LocalAffineCRS):
        return (
            np.asarray(x, dtype=np.float64) / crs.sx + crs.lon0,
            np.asarray(y, dtype=np.float64) / crs.sy + crs.lat0,
        )
    raise ValueError(f"unsupported CRS {crs!r}")


def _from_lonlat(crs, lon, lat):
    if crs == EPSG_4326:
        return lon, lat
    if crs == EPSG_3857:
        return _lonlat_to_merc(lon, lat)
    if isinstance(crs, LocalAffineCRS):
        return (lon - crs.lon0) * crs.sx, (lat - crs.lat0) * crs.sy
    raise ValueError(f"unsupported CRS {crs!r}")


def reproject_extent(t: Transformer, xmin, ymin, xmax, ymax, n: int = 16):
    """Densified-edge extent reprojection (matches the standard practice the
    reference's ReprojectRasterExtent relies on): sample n points along each
    edge, take the envelope."""
    xs = np.linspace(xmin, xmax, n)
    ys = np.linspace(ymin, ymax, n)
    ex = np.concatenate([xs, xs, np.full(n, xmin), np.full(n, xmax)])
    ey = np.concatenate([np.full(n, ymin), np.full(n, ymax), ys, ys])
    tx, ty = t.transform(ex, ey)
    return float(tx.min()), float(ty.min()), float(tx.max()), float(ty.max())
