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

# widening order of the numeric lattice (reference lattice + the wide types a
# real user hits in DEMs/masks: bit, uint32, int64 — RasterSourceF.scala:37-43)
_ORDER = ["bit", "uint8", "int8", "uint16", "int16", "uint32", "int32",
          "int64", "float32", "float64"]

# integer value ranges; "bit" is a 1-bit cell stored in uint8 arrays
_INT_RANGE = {
    "bit": (0, 1),
    "uint8": (0, 255),
    "int8": (np.iinfo(np.int8).min, np.iinfo(np.int8).max),
    "uint16": (0, np.iinfo(np.uint16).max),
    "int16": (np.iinfo(np.int16).min, np.iinfo(np.int16).max),
    "uint32": (0, np.iinfo(np.uint32).max),
    "int32": (np.iinfo(np.int32).min, np.iinfo(np.int32).max),
    "int64": (np.iinfo(np.int64).min, np.iinfo(np.int64).max),
}

_DEFAULT_NODATA = {
    # bit has NO NoData variant (every 1-bit pattern is a value) — absent here
    "uint8": 0,
    "int8": np.iinfo(np.int8).min,
    "uint16": 0,
    "int16": np.iinfo(np.int16).min,
    "uint32": 0,
    "int32": np.iinfo(np.int32).min,
    "int64": np.iinfo(np.int64).min,
    "float32": float("nan"),
    "float64": float("nan"),
}

# NEW wide integer types whose union with any float widens straight to
# float64.  int32 x float32 stays float32 for reference parity
# (MosaicRasterSource.scala:65-68 — GeoTrellis IntCells ∪ FloatCells is
# FloatCellType), lossy as that is; the reference has no uint32/int64 so the
# repo picks the lossless widening for them.
_F32_LOSSY = {"uint32", "int64"}


@dataclass(frozen=True)
class CellType:
    dtype: str  # numpy dtype name, or "bit" (1-bit cells in uint8 arrays)
    nodata: float | None = None  # None => no NoData semantics ("raw" cell type)

    def __post_init__(self):
        if self.dtype not in _ORDER:
            raise ValueError(f"unknown cell type {self.dtype!r}")
        if self.dtype == "bit" and self.nodata is not None:
            raise ValueError("bit cells have no NoData variant "
                             "(every 1-bit pattern is a value)")

    @property
    def is_float(self) -> bool:
        return self.dtype.startswith("float")

    @property
    def np_dtype(self):
        return np.dtype("uint8" if self.dtype == "bit" else self.dtype)

    @staticmethod
    def of(name: str) -> "CellType":
        """Parse 'int16' (raw), 'int16ud-32768' (user nodata), 'int16nd'
        (default nodata) — compact string form stored in tile tables."""
        if "ud" in name:
            dt, nd = name.split("ud")
            return CellType(dt, float(nd))
        if name.endswith("nd") and name != "bit":
            dt = name[:-2]
            if dt not in _DEFAULT_NODATA:
                raise ValueError(f"{dt!r} has no default-NoData variant")
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
            if "float64" in (a.dtype, b.dtype) or {a.dtype, b.dtype} & _F32_LOSSY:
                dtype = "float64"
            else:
                dtype = "float32"
        else:
            lo = min(_INT_RANGE[a.dtype][0], _INT_RANGE[b.dtype][0])
            hi = max(_INT_RANGE[a.dtype][1], _INT_RANGE[b.dtype][1])
            dtype = "float64"
            for cand in _ORDER[:-2]:
                cmin, cmax = _INT_RANGE[cand]
                if cmin <= lo and cmax >= hi:
                    dtype = cand
                    break
        if dtype == "bit":
            return CellType("bit", None)
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
    if not src.is_float and not dst.is_float:
        # integer -> integer stays in integer space: a native cast IS the
        # two's-complement wrap and remains EXACT at int64 magnitudes (the
        # float64 detour loses bits past 2^53)
        imin, imax = _INT_RANGE[dst.dtype]
        if gdal_clamp:
            out = np.clip(arr.astype(np.int64, copy=False), imin, imax).astype(dst.np_dtype)
        else:
            out = arr.astype(dst.np_dtype)
            if dst.dtype == "bit":
                out = np.bitwise_and(out, np.uint8(1))
        if dst.nodata is not None:
            out[nd_mask] = dst.nodata
        return out
    vals = arr.astype(np.float64, copy=True)
    if dst.is_float:
        out = vals.astype(dst.np_dtype)
        if dst.nodata is not None:
            out[nd_mask] = dst.nodata
        return out
    imin, imax = _INT_RANGE[dst.dtype]
    if gdal_clamp:
        vals = np.clip(np.rint(vals), float(imin), float(imax))
    else:
        vals = np.trunc(vals)
        # two's-complement style wrap for out-of-range, matching a plain cast.
        # Apply it ONLY to out-of-range cells: the float64 modulo is lossy at
        # int64 magnitudes (span 2^64 rounds every in-range value to ~0), so
        # in-range values must pass through untouched.
        in_range = (vals >= float(imin)) & (vals <= float(imax))
        if not in_range.all():
            span = float(imax) - float(imin) + 1.0
            vals = np.where(in_range, vals, (vals - imin) % span + imin)
    out = vals.astype(dst.np_dtype)
    if dst.nodata is not None:
        out[nd_mask] = dst.nodata
    return out


def interpret_as(ct: CellType, new_nodata: float | None) -> CellType:
    """``interpretAs`` (T10, CHANGELOG.md:28): reinterpret NoData without
    touching cell values — metadata-only."""
    return CellType(ct.dtype, new_nodata)
