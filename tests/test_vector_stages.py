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
