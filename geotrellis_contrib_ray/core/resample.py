"""Resample kernels: nearest / bilinear / cubic / average over
(bands, rows, cols) arrays.

Vectorized numpy equivalents of the reference's ``tile.resample(cols, rows,
method)`` path (GeoTiffResampleRasterSource.scala:35-142) and the GDAL
method set its warp options accept.  NoData cells are excluded from
bilinear/average weights; cubic is the Catmull-Rom (a=-0.5) convolution,
separable and applied rows-then-cols.
"""

from __future__ import annotations

import numpy as np

NEAREST = "nearest"
BILINEAR = "bilinear"
CUBIC = "cubic"
AVERAGE = "average"


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
    if method == CUBIC:
        return _resample_cubic(arr, rc, cc, nodata)
    if method == AVERAGE:
        return _resample_average(arr, dst_rows, dst_cols, nodata)
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


def _cubic_weights(f: np.ndarray) -> np.ndarray:
    """Catmull-Rom kernel weights for taps at offsets (-1, 0, 1, 2) given the
    fractional position f in [0, 1): (4, N)."""
    a = -0.5
    x = np.stack([f + 1.0, f, 1.0 - f, 2.0 - f])  # |distance| per tap
    w = np.where(
        x <= 1.0,
        (a + 2.0) * x**3 - (a + 3.0) * x**2 + 1.0,
        a * x**3 - 5.0 * a * x**2 + 8.0 * a * x - 4.0 * a,
    )
    return w


def _resample_cubic(arr: np.ndarray, rc: np.ndarray, cc: np.ndarray,
                    nodata: float | None) -> np.ndarray:
    _, rows, cols = arr.shape
    r0 = np.floor(rc).astype(np.int64)
    c0 = np.floor(cc).astype(np.int64)
    wr = _cubic_weights(np.clip(rc - r0, 0.0, 1.0))  # (4, R)
    wc = _cubic_weights(np.clip(cc - c0, 0.0, 1.0))  # (4, C)
    taps_r = np.clip(r0[None, :] + np.arange(-1, 3)[:, None], 0, rows - 1)  # (4, R)
    taps_c = np.clip(c0[None, :] + np.arange(-1, 3)[:, None], 0, cols - 1)  # (4, C)
    vals = arr.astype(np.float64)
    if nodata is not None:
        nd_mask = np.isnan(vals) if np.isnan(nodata) else vals == nodata
        valid = (~nd_mask).astype(np.float64)
        vals = np.where(nd_mask, 0.0, vals)
    else:
        nd_mask = None
        valid = None
    nb = arr.shape[0]
    out = np.zeros((nb, len(rc), len(cc)), dtype=np.float64)
    wsum = np.zeros_like(out)
    for i in range(4):
        for j in range(4):
            w = (wr[i][:, None] * wc[j][None, :])[None]  # (1, R, C)
            sub = vals[:, taps_r[i][:, None], taps_c[j][None, :]]
            if valid is not None:
                vsub = valid[:, taps_r[i][:, None], taps_c[j][None, :]]
                out += sub * w * vsub
                wsum += w * vsub
            else:
                out += sub * w
                wsum += w
    with np.errstate(divide="ignore", invalid="ignore"):
        out = out / wsum
    if nodata is not None:
        # a destination cell whose nearest source cell is NoData stays NoData
        ri = np.clip(np.rint(rc).astype(np.int64), 0, rows - 1)
        ci = np.clip(np.rint(cc).astype(np.int64), 0, cols - 1)
        center = nd_mask[:, ri[:, None], ci[None, :]]
        out[center] = nodata
        out[wsum == 0] = nodata
    return out


def _resample_average(arr: np.ndarray, dst_rows: int, dst_cols: int,
                      nodata: float | None) -> np.ndarray:
    """Area-average (box) resample — the canonical overview/downsample
    kernel: each destination cell is the mean of the source cells whose
    centers fall in its footprint (NoData excluded)."""
    _, rows, cols = arr.shape
    # destination bin of each source row/col CENTER: center of source cell i
    # is (i + 0.5)/src in unit space -> bin floor((2i+1)*dst / (2*src)) —
    # binning by the LEFT EDGE (i*dst//src) shifts half-covered cells into
    # the previous bin for non-integer ratios
    rbin = np.minimum(((2 * np.arange(rows, dtype=np.int64) + 1) * dst_rows) // (2 * rows), dst_rows - 1)
    cbin = np.minimum(((2 * np.arange(cols, dtype=np.int64) + 1) * dst_cols) // (2 * cols), dst_cols - 1)
    vals = arr.astype(np.float64)
    if nodata is not None:
        valid = ~np.isnan(vals) if np.isnan(nodata) else vals != nodata
    else:
        valid = np.ones_like(vals, dtype=bool)
    out = np.zeros((arr.shape[0], dst_rows, dst_cols), dtype=np.float64)
    cnt = np.zeros_like(out)
    flat_bin = (rbin[:, None] * dst_cols + cbin[None, :]).ravel()
    for b in range(arr.shape[0]):
        v = np.where(valid[b], vals[b], 0.0).ravel()
        m = valid[b].astype(np.float64).ravel()
        out[b] = np.bincount(flat_bin, weights=v, minlength=dst_rows * dst_cols).reshape(
            dst_rows, dst_cols
        )
        cnt[b] = np.bincount(flat_bin, weights=m, minlength=dst_rows * dst_cols).reshape(
            dst_rows, dst_cols
        )
    with np.errstate(divide="ignore", invalid="ignore"):
        res = out / cnt
    if nodata is not None:
        res[cnt == 0] = nodata
    else:
        res[cnt == 0] = 0.0
    return res


def sample_at(pixels, sgrid, tx, ty, method: str = NEAREST, nodata=None):
    """Sample a (bands, rows, cols) stack at world coordinates: the output
    grid is the outer product ``ty x tx`` (row-major).  ``sgrid`` georefs
    ``pixels``.  Cells outside the source footprint get ``nodata`` (0 when
    None).  Exact kernels: nearest (cell membership) and bilinear
    (center-anchored fractional weights, edge-clamped)."""
    import numpy as np

    if method not in (NEAREST, BILINEAR):
        raise ValueError(f"sample_at supports nearest|bilinear, got {method!r}")
    b, rows, cols = pixels.shape
    fill = np.array(0 if nodata is None else nodata).astype(pixels.dtype)
    fx = (np.asarray(tx, np.float64) - sgrid.extent.xmin) / sgrid.cellwidth
    fy = (sgrid.extent.ymax - np.asarray(ty, np.float64)) / sgrid.cellheight
    okx = (fx >= 0) & (fx < cols)
    oky = (fy >= 0) & (fy < rows)
    ok = oky[:, None] & okx[None, :]
    if method == NEAREST:
        cx = np.clip(np.floor(fx).astype(np.int64), 0, cols - 1)
        cy = np.clip(np.floor(fy).astype(np.int64), 0, rows - 1)
        out = pixels[:, cy[:, None], cx[None, :]]
        return np.where(ok[None], out, fill)
    # bilinear on cell CENTERS: fractional position relative to center grid
    gx = np.clip(fx - 0.5, 0.0, cols - 1.0)
    gy = np.clip(fy - 0.5, 0.0, rows - 1.0)
    x0 = np.floor(gx).astype(np.int64)
    y0 = np.floor(gy).astype(np.int64)
    x1 = np.minimum(x0 + 1, cols - 1)
    y1 = np.minimum(y0 + 1, rows - 1)
    wx = (gx - x0)[None, None, :]
    wy = (gy - y0)[None, :, None]
    p = pixels.astype(np.float64)
    top = p[:, y0[:, None], x0[None, :]] * (1 - wx) + p[:, y0[:, None], x1[None, :]] * wx
    bot = p[:, y1[:, None], x0[None, :]] * (1 - wx) + p[:, y1[:, None], x1[None, :]] * wx
    out = top * (1 - wy) + bot * wy
    return np.where(ok[None], out, fill.astype(np.float64))
