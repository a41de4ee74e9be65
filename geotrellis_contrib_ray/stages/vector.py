"""Vector-table stages: the slick/PostGIS surface as Ray Data operators.

Covers S5/S6 (geometry table source/sink + WKB/EWKT codecs), J1 (`@&&` bbox
filter), J3 (distance self-join with the reference's "%1.4f" output format,
PostgisSpec.scala:174-188), J7 (anti-join delete-as-rewrite), F1-F8 scalar
functions over geometry columns (distance/length/centroid/GeoJSON/bbox/
fixed-width parse/null predicates).

Geometry columns are WKB ``binary`` (+ optional srid int32); point-only
columns additionally keep (x, y) float64 for vectorized math — decode of a
point WKB column is a zero-copy-ish numpy reinterpretation of the fixed
21-byte little-endian layout, no per-row parsing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import geom as geommod


def encode_points_wkb(batch: pa.Table, x_col: str = "x", y_col: str = "y") -> pa.Table:
    """Add a WKB binary column from point coordinate columns (S6 encode)."""
    xs = batch[x_col].to_numpy(zero_copy_only=False)
    ys = batch[y_col].to_numpy(zero_copy_only=False)
    n = len(xs)
    buf = np.empty((n, 21), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1] = 1
    buf[:, 2:5] = 0
    buf[:, 5:13] = np.ascontiguousarray(xs, dtype="<f8").view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = np.ascontiguousarray(ys, dtype="<f8").view(np.uint8).reshape(n, 8)
    flat = buf.reshape(-1)
    offsets = pa.array(np.arange(0, (n + 1) * 21, 21, dtype=np.int32))
    wkb = pa.BinaryArray.from_buffers(
        pa.binary(), n, [None, offsets.buffers()[1], pa.py_buffer(flat.tobytes())]
    )
    return batch.append_column("wkb", wkb)


def decode_point_wkb(batch: pa.Table, col: str = "wkb") -> pa.Table:
    """Vectorized decode of a little-endian WKB point column -> (x, y).

    Falls back to the general parser for rows that aren't plain LE points
    (hex strings, EWKB with SRID, other geometry types)."""
    arr = batch[col].combine_chunks() if isinstance(batch[col], pa.ChunkedArray) else batch[col]
    n = len(arr)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[arr.offset : arr.offset + n + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = offs[1:] - offs[:-1]
    xs = np.full(n, np.nan)
    ys = np.full(n, np.nan)
    fast = lens == 21
    if fast.any():
        starts = offs[:-1][fast]
        idx = starts[:, None] + np.arange(21)[None, :]
        rows = data[idx]
        is_pt = (rows[:, 0] == 1) & (rows[:, 1] == 1) & (rows[:, 2:5] == 0).all(axis=1)
        coords_x = rows[:, 5:13].copy().view("<f8").ravel()
        coords_y = rows[:, 13:21].copy().view("<f8").ravel()
        tgt = np.nonzero(fast)[0][is_pt]
        xs[tgt] = coords_x[is_pt]
        ys[tgt] = coords_y[is_pt]
        slow_mask = ~fast.copy()
        slow_mask[np.nonzero(fast)[0][~is_pt]] = True
    else:
        slow_mask = ~fast
    for i in np.nonzero(slow_mask)[0]:
        v = arr[i].as_py()
        if v is None:
            continue
        kind, coords, _ = geommod.wkb_to_geometry(v)
        if kind == "Point":
            xs[i], ys[i] = coords
    return batch.append_column("x", pa.array(xs)).append_column("y", pa.array(ys))


def bbox_filter(ds, xmin: float, ymin: float, xmax: float, ymax: float, x_col="x", y_col="y"):
    """`@&&` bbox-overlap filter (PostgisSpec.scala:133-140,161-170)."""

    def f(batch: pa.Table) -> pa.Table:
        xs = batch[x_col].to_numpy(zero_copy_only=False)
        ys = batch[y_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(geommod.box_contains_points(xs, ys, xmin, ymin, xmax, ymax)))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def anti_bbox_filter(ds, xmin, ymin, xmax, ymax, x_col="x", y_col="y"):
    """J7 delete-as-rewrite: keep rows NOT matching the spatial predicate."""

    def f(batch: pa.Table) -> pa.Table:
        xs = batch[x_col].to_numpy(zero_copy_only=False)
        ys = batch[y_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(~geommod.box_contains_points(xs, ys, xmin, ymin, xmax, ymax)))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def add_geojson(batch: pa.Table, x_col="x", y_col="y") -> pa.Table:
    """F4 asGeoJSON — exact reference format ({"type":"Point",...},
    PostgisSpec.scala:191-196).  Python-level formatting, small tables."""
    xs = batch[x_col].to_numpy(zero_copy_only=False)
    ys = batch[y_col].to_numpy(zero_copy_only=False)
    gj = [geommod.point_geojson(float(x), float(y)) for x, y in zip(xs, ys)]
    return batch.append_column("geojson", pa.array(gj, pa.string()))


def distance_join_formatted(ds, theta: float, name_col: str = "name", id_col: str = "id"):
    """J3 with reference output shape: (n1, n2, "%1.4f" % dist) for all pairs
    with dist < theta and different names (PostgisSpec.scala:174-188).

    Composes the grid-partitioned distance_join; the name-inequality refine
    and formatting happen in the per-cell reduce."""
    from . import spatial as sp
    from ..core import cells as cellmod

    res = sp._dist_cell_res(theta)
    pairs_src = ds.map_batches(
        _NamedReplicate(res, id_col, name_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )

    def _empty():
        z = pa.array([], pa.string())
        return pa.table({"n1": z, "n2": z, "dist": pa.array([], pa.string())})

    def per_cell(g):
        left = g[g["side"] == 0]
        right = g[g["side"] == 1]
        if len(left) == 0 or len(right) == 0:
            return _empty()
        lx = left["lon"].to_numpy()
        ly = left["lat"].to_numpy()
        rx = right["lon"].to_numpy()
        ry = right["lat"].to_numpy()
        lid = left["id"].to_numpy()
        rid = right["id"].to_numpy()
        lname = left["name"].to_numpy()
        rname = right["name"].to_numpy()
        # CHUNKED kernel (r5, same bound as spatial.distance_join): fixed
        # left row-blocks x full right — a hot cell can't spike worker
        # memory; the distance doubles and "%1.4f" formatting are unchanged
        step = max(1, sp._DIST_KERNEL_CELLS // max(1, len(rid)))
        out = {"n1": [], "n2": [], "dist": []}
        for s in range(0, len(lid), step):
            lxs, lys = lx[s:s + step], ly[s:s + step]
            d = np.sqrt((lxs[:, None] - rx[None, :]) ** 2 + (lys[:, None] - ry[None, :]) ** 2)
            ii, jj = np.nonzero((d < theta) & (lid[s:s + step, None] != rid[None, :]))
            if len(ii) == 0:
                continue
            # vectorized name-inequality refine, then per-pair formatting
            # over only the SURVIVING pairs (tiny by definition)
            nm = lname[s + ii] != rname[jj]
            ii, jj = ii[nm], jj[nm]
            out["n1"].extend(lname[s + ii].tolist())
            out["n2"].extend(rname[jj].tolist())
            out["dist"].extend(f"{v:.4f}" for v in d[ii, jj])
        if not out["n1"]:
            return _empty()
        return pa.table({"n1": pa.array(out["n1"], pa.string()),
                         "n2": pa.array(out["n2"], pa.string()),
                         "dist": pa.array(out["dist"], pa.string())})

    return pairs_src.groupby("cell").map_groups(per_cell, batch_format="pandas")


class _NamedReplicate:
    """distance-join replicate carrying (id, name) for the formatted variant.
    Ordered pairs (both directions) — matches the reference's cross-join."""

    def __init__(self, res: int, id_col: str, name_col: str):
        self.res = res
        self.id_col = id_col
        self.name_col = name_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..core import cells as cellmod

        lon = batch["x"].to_numpy(zero_copy_only=False)
        lat = batch["y"].to_numpy(zero_copy_only=False)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        names = batch[self.name_col].to_numpy(zero_copy_only=False)
        x, y = cellmod.latlng_to_cell_xy(lat, lon, self.res)
        nx = np.int64(2) ** (self.res + 1)
        ny = np.int64(2) ** self.res
        parts = {k: [] for k in ("id", "name", "lon", "lat", "cell", "side")}
        n = len(ids)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cx, cy = x + dx, y + dy
                ok = (cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny)
                parts["id"].append(ids[ok])
                parts["name"].append(names[ok])
                parts["lon"].append(lon[ok])
                parts["lat"].append(lat[ok])
                parts["cell"].append(cellmod.pack_cell(self.res, cx[ok], cy[ok]))
                parts["side"].append(np.zeros(int(ok.sum()), dtype=np.int8))
                if dx == 0 and dy == 0:
                    parts["id"].append(ids)
                    parts["name"].append(names)
                    parts["lon"].append(lon)
                    parts["lat"].append(lat)
                    parts["cell"].append(cellmod.pack_cell(self.res, x, y))
                    parts["side"].append(np.ones(n, dtype=np.int8))
        return pa.table(
            {
                "id": np.concatenate(parts["id"]),
                "name": pa.array(np.concatenate(parts["name"]).astype(object), pa.string()),
                "lon": np.concatenate(parts["lon"]),
                "lat": np.concatenate(parts["lat"]),
                "cell": np.concatenate(parts["cell"]),
                "side": np.concatenate(parts["side"]),
            }
        )


def cities_dataset():
    """The 26-row PA cities fixture as a Dataset (id, name, x, y, wkb) —
    insertion order preserved in the id column (PostgisSpec order asserts)."""
    import ray.data as rd

    from ..functions.cities import CITIES

    t = pa.table(
        {
            "id": pa.array(range(len(CITIES)), pa.int64()),
            "name": pa.array([c[0] for c in CITIES], pa.string()),
            "x": pa.array([c[1] for c in CITIES], pa.float64()),
            "y": pa.array([c[2] for c in CITIES], pa.float64()),
        }
    )
    return rd.from_arrow(encode_points_wkb(t))
