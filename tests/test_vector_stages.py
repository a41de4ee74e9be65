"""Vector-stage parity with the reference's slick/PostGIS specs."""

import numpy as np
import pyarrow as pa

from geotrellis_contrib_ray.functions.cities import CITIES
from geotrellis_contrib_ray.stages import vector as vec


def test_wkb_encode_decode_roundtrip_vectorized():
    t = pa.table({"x": [1.5, -77.42, 0.0], "y": [2.5, 40.37, -90.0]})
    enc = vec.encode_points_wkb(t)
    dec = vec.decode_point_wkb(enc.select(["wkb"]))
    assert dec["x"].to_pylist() == t["x"].to_pylist()
    assert dec["y"].to_pylist() == t["y"].to_pylist()


def test_decode_handles_hex_and_ewkb_fallback():
    from geotrellis_contrib_ray.core import geom

    rows = [geom.point_to_wkb(1.0, 2.0), geom.point_to_wkb(3.0, 4.0, srid=4326)]
    t = pa.table({"wkb": pa.array(rows, pa.binary())})
    dec = vec.decode_point_wkb(t)
    assert dec["x"].to_pylist() == [1.0, 3.0]
    assert dec["y"].to_pylist() == [2.0, 4.0]


def test_bbox_filter_altoona_golden(ray_session):
    # bboxBuffer(78.32, 40.30, 0.01) selects exactly Altoona (PostgisSpec:161-170)
    ds = vec.cities_dataset()
    hit = vec.bbox_filter(ds, 78.32 - 0.01, 40.30 - 0.01, 78.32 + 0.01, 40.30 + 0.01)
    names = [r["name"] for r in hit.take_all()]
    assert names == ["Altoona,PA"]


def test_anti_bbox_filter_delete_semantics(ray_session):
    ds = vec.cities_dataset()
    rest = vec.anti_bbox_filter(ds, 78.32 - 0.01, 40.30 - 0.01, 78.32 + 0.01, 40.30 + 0.01)
    assert rest.count() == len(CITIES) - 1
    assert "Altoona,PA" not in {r["name"] for r in rest.take_all()}


def test_distance_join_formatted_matches_reference_oracle(ray_session):
    # PostgisSpec.scala:174-188: cross-join oracle, d < 0.5, name != name,
    # output (n1, n2, "%1.4f")
    ds = vec.cities_dataset()
    got = vec.distance_join_formatted(ds, 0.5, name_col="name", id_col="id").to_pandas()
    got_set = sorted(map(tuple, got[["n1", "n2", "dist"]].to_numpy()))
    xs = np.array([c[1] for c in CITIES])
    ys = np.array([c[2] for c in CITIES])
    exp = []
    for i in range(len(CITIES)):
        for j in range(len(CITIES)):
            d = float(np.sqrt((xs[i] - xs[j]) ** 2 + (ys[i] - ys[j]) ** 2))
            if d < 0.5 and i != j and CITIES[i][0] != CITIES[j][0]:
                exp.append((CITIES[i][0], CITIES[j][0], f"{d:.4f}"))
    assert got_set == sorted(exp)
    assert len(exp) > 0


def test_geojson_golden(ray_session):
    ds = vec.cities_dataset()
    out = ds.map_batches(vec.add_geojson, batch_format="pyarrow", batch_size=None).to_pandas()
    reading = out[out["name"] == "Reading,PA"]["geojson"].iloc[0]
    assert reading == '{"type":"Point","coordinates":[75.97,40.38]}'


def test_nullable_geometry_predicates():
    # F8: null geometry handling (PostgisSpec.scala:210-235)
    from geotrellis_contrib_ray.core import geom

    rows = [geom.point_to_wkb(1.0, 2.0), None, geom.point_to_wkb(3.0, 4.0)]
    t = pa.table({"wkb": pa.array(rows, pa.binary())})
    dec = vec.decode_point_wkb(t)
    defined = ~np.isnan(dec["x"].to_numpy(zero_copy_only=False))
    assert defined.tolist() == [True, False, True]


def test_fixed_width_parser():
    # F7 (Data.scala:25-57 parser shape)
    from geotrellis_contrib_ray.functions.cities import parse_city_line

    name, lon, lat = parse_city_line("[AOO]  40.65   75.43 Allentown,PA")
    assert name == "Allentown,PA" and (lon, lat) == (75.43, 40.65)


def test_distance_kernels_chunked_hot_cell(ray_session, monkeypatch):
    """r5: a planted hot cell (every point in one grid cell) must stream
    through the chunked dense kernel — force tiny chunks and pin exact
    parity with the single-shot brute force for both J3 kernels."""
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_contrib_ray.stages import spatial as sp
    from geotrellis_contrib_ray.stages.vector import distance_join_formatted

    rng = np.random.default_rng(41)
    n = 120
    # all points inside a theta/10 box -> one hot cell holds everything
    xs = rng.uniform(0.0, 0.05, n)
    ys = rng.uniform(0.0, 0.05, n)
    theta = 0.5
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lon": pa.array(xs), "lat": pa.array(ys),
    })
    # force many chunks: 200 matrix cells per block over a 120x120 cell
    monkeypatch.setattr(sp, "_DIST_KERNEL_CELLS", 200)
    out = sp.distance_join(rd.from_arrow(t), theta).to_pandas()
    got = sorted(zip(out["id1"].astype(int), out["id2"].astype(int),
                     np.round(out["dist"], 12)))
    d = np.sqrt((xs[:, None] - xs[None, :]) ** 2 + (ys[:, None] - ys[None, :]) ** 2)
    ii, jj = np.nonzero((d < theta) & (np.arange(n)[:, None] < np.arange(n)[None, :]))
    exp = sorted(zip(ii, jj, np.round(d[ii, jj], 12)))
    assert got == exp and len(got) == n * (n - 1) // 2

    # formatted variant (name-inequality refine) under the same tiny chunks
    tf = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "name": pa.array([f"p{int(i) % 7}" for i in range(n)], pa.string()),
        "x": pa.array(xs), "y": pa.array(ys),
    })
    outf = distance_join_formatted(rd.from_arrow(tf), theta, name_col="name",
                                   id_col="id").to_pandas()
    names = np.array([f"p{int(i) % 7}" for i in range(n)], dtype=object)
    iif, jjf = np.nonzero((d < theta) & (np.arange(n)[:, None] != np.arange(n)[None, :]))
    expf = sorted((names[i], names[j], f"{d[i, j]:.4f}")
                  for i, j in zip(iif, jjf) if names[i] != names[j])
    gotf = sorted(zip(outf["n1"], outf["n2"], outf["dist"]))
    assert gotf == expf
