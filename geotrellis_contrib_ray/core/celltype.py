"""Cell types: the per-pixel primitive lattice + conversion semantics.

Mirrors the reference's ``CellType`` surface (SURVEY.md §1.1): widening
``union`` (MosaicRasterSource.scala:65-68), conversion with NoData masking
(RasterSourceF.scala:165-184), and GDAL's documented divergence — Byte targets
clamp to [0,255] and round (gdal/.../GDALRasterSource.scala:128-152) — behind
an explicit ``gdal_clamp`` flag.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# widening order of the numeric lattice
_ORDER = ["uint8", "int8", "uint16", "int16", "int32", "float32", "float64"]

_DEFAULT_NODATA = {
    "uint8": 0,
    "int8": np.iinfo(np.int8).min,
    "uint16": 0,
    "int16": np.iinfo(np.int16).min,
    "int32": np.iinfo(np.int32).min,
    "float32": float("nan"),
    "float64": float("nan"),
}


@dataclass(frozen=True)
class CellType:
    dtype: str  # numpy dtype name
    nodata: float | None = None  # None => no NoData semantics ("raw" cell type)

    @property
    def is_float(self) -> bool:
        return self.dtype.startswith("float")

    @property
    def np_dtype(self):
        return np.dtype(self.dtype)

    @staticmethod
    def of(name: str) -> "CellType":
        """Parse 'int16' (raw), 'int16ud-32768' (user nodata), 'int16nd'
        (default nodata) — compact string form stored in tile tables."""
        if "ud" in name:
            dt, nd = name.split("ud")
            return CellType(dt, float(nd))
        if name.endswith("nd"):
            dt = name[:-2]
            return CellType(dt, _DEFAULT_NODATA[dt])
        return CellType(name, None)

    @property
    def name(self) -> str:
        if self.nodata is None:
            return self.dtype
        if self.is_float and np.isnan(self.nodata):
            return self.dtype + "nd"
        if self.nodata == _DEFAULT_NODATA.get(self.dtype):
            return self.dtype + "nd"
        nd = self.nodata
        return f"{self.dtype}ud{int(nd) if nd == int(nd) else nd}"

    def union(self, other: "CellType") -> "CellType":
        """Widening union (MosaicRasterSource.scala:65-68): the smallest type
        whose value range covers both operands; NoData-ness is sticky."""
        a, b = self, other
        has_nd = a.nodata is not None or b.nodata is not None
        if a.is_float or b.is_float:
            dtype = "float64" if "float64" in (a.dtype, b.dtype) else "float32"
        else:
            lo = min(np.iinfo(a.np_dtype).min, np.iinfo(b.np_dtype).min)
            hi = max(np.iinfo(a.np_dtype).max, np.iinfo(b.np_dtype).max)
            dtype = "float64"
            for cand in _ORDER[:-2]:
                info = np.iinfo(np.dtype(cand))
                if info.min <= lo and info.max >= hi:
                    dtype = cand
                    break
        return CellType(dtype, _DEFAULT_NODATA[dtype] if has_nd else None)

    def mask(self, arr: np.ndarray) -> np.ndarray:
        """Boolean mask of NoData cells."""
        if self.nodata is None:
            return np.zeros(arr.shape, dtype=bool)
        if self.is_float and np.isnan(self.nodata):
            return np.isnan(arr)
        return arr == self.nodata


def convert(arr: np.ndarray, src: CellType, dst: CellType, gdal_clamp: bool = False) -> np.ndarray:
    """Cast pixels src->dst preserving NoData cells (T6).

    ``gdal_clamp=True`` replicates GDAL's Byte semantics: round + clamp into
    [0, 255] instead of two's-complement wraparound
    (GDALRasterSource.scala:128-162, documented divergence in SURVEY.md T6).
    """
    nd_mask = src.mask(arr)
    vals = arr.astype(np.float64, copy=True)
    if dst.is_float:
        out = vals.astype(dst.np_dtype)
        if dst.nodata is not None:
            out[nd_mask] = dst.nodata
        return out
    info = np.iinfo(dst.np_dtype)
    if gdal_clamp:
        vals = np.clip(np.rint(vals), info.min, info.max)
    else:
        vals = np.trunc(vals)
        # two's-complement style wrap for out-of-range, matching a plain cast.
        # Apply it ONLY to out-of-range cells: the float64 modulo is lossy at
        # int64 magnitudes (span 2^64 rounds every in-range value to ~0), so
        # in-range values must pass through untouched.
        in_range = (vals >= float(info.min)) & (vals <= float(info.max))
        if not in_range.all():
            span = float(info.max) - float(info.min) + 1.0
            vals = np.where(in_range, vals, (vals - info.min) % span + info.min)
    out = vals.astype(dst.np_dtype)
    if dst.nodata is not None:
        out[nd_mask] = dst.nodata
    return out


def interpret_as(ct: CellType, new_nodata: float | None) -> CellType:
    """``interpretAs`` (T10, CHANGELOG.md:28): reinterpret NoData without
    touching cell values — metadata-only."""
    return CellType(ct.dtype, new_nodata)
