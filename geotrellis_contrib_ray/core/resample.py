"""Resample kernels: nearest + bilinear over (bands, rows, cols) arrays.

Vectorized numpy equivalents of the reference's ``tile.resample(cols, rows,
method)`` path (GeoTiffResampleRasterSource.scala:35-142).  NoData cells are
excluded from bilinear interpolation weights.
"""

from __future__ import annotations

import numpy as np

NEAREST = "nearest"
BILINEAR = "bilinear"


def _sample_coords(src_n: int, dst_n: int) -> np.ndarray:
    """Fractional source coordinate of each destination pixel center."""
    return (np.arange(dst_n, dtype=np.float64) + 0.5) * (src_n / dst_n) - 0.5


def resample(arr: np.ndarray, dst_rows: int, dst_cols: int, method: str = NEAREST,
             nodata: float | None = None) -> np.ndarray:
    """Resample (bands, rows, cols) -> (bands, dst_rows, dst_cols)."""
    if arr.ndim == 2:
        arr = arr[None, :, :]
    _, rows, cols = arr.shape
    rc = _sample_coords(rows, dst_rows)
    cc = _sample_coords(cols, dst_cols)
    if method == NEAREST:
        ri = np.clip(np.rint(rc).astype(np.int64), 0, rows - 1)
        ci = np.clip(np.rint(cc).astype(np.int64), 0, cols - 1)
        return arr[:, ri[:, None], ci[None, :]]
    if method != BILINEAR:
        raise ValueError(f"unsupported resample method {method}")
    r0 = np.clip(np.floor(rc).astype(np.int64), 0, rows - 1)
    r1 = np.clip(r0 + 1, 0, rows - 1)
    c0 = np.clip(np.floor(cc).astype(np.int64), 0, cols - 1)
    c1 = np.clip(c0 + 1, 0, cols - 1)
    fr = np.clip(rc - r0, 0.0, 1.0)[:, None]
    fc = np.clip(cc - c0, 0.0, 1.0)[None, :]
    vals = arr.astype(np.float64)
    if nodata is not None:
        if np.isnan(nodata):
            valid = ~np.isnan(vals)
        else:
            valid = vals != nodata
        vals = np.where(valid, vals, 0.0)
    else:
        valid = np.ones_like(vals, dtype=bool)
    w00 = (1 - fr) * (1 - fc)
    w01 = (1 - fr) * fc
    w10 = fr * (1 - fc)
    w11 = fr * fc
    out = np.empty((arr.shape[0], dst_rows, dst_cols), dtype=np.float64)
    wsum = np.empty((dst_rows, dst_cols), dtype=np.float64)
    for b in range(arr.shape[0]):
        v = vals[b]
        m = valid[b].astype(np.float64)
        acc = (
            v[r0[:, None], c0[None, :]] * w00 * m[r0[:, None], c0[None, :]]
            + v[r0[:, None], c1[None, :]] * w01 * m[r0[:, None], c1[None, :]]
            + v[r1[:, None], c0[None, :]] * w10 * m[r1[:, None], c0[None, :]]
            + v[r1[:, None], c1[None, :]] * w11 * m[r1[:, None], c1[None, :]]
        )
        ws = (
            w00 * m[r0[:, None], c0[None, :]]
            + w01 * m[r0[:, None], c1[None, :]]
            + w10 * m[r1[:, None], c0[None, :]]
            + w11 * m[r1[:, None], c1[None, :]]
        )
        np.copyto(wsum, ws)
        with np.errstate(divide="ignore", invalid="ignore"):
            out[b] = acc / wsum
        if nodata is not None:
            out[b][wsum == 0] = nodata
    if nodata is not None and not np.isnan(nodata):
        out = np.where(np.isnan(out), nodata, out)
    return out.astype(arr.dtype) if np.issubdtype(arr.dtype, np.floating) else out
