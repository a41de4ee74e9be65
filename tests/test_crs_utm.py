"""Ellipsoidal Transverse Mercator (UTM) kernel: Krüger 6th-order series.

Reference parity: the reference's warp path reprojects to UTM codes through
GDAL/Proj (GDALBaseRasterSource.scala reproject options); our closed-form CRS
set gains the same EPSG:326xx/327xx family with a pure-numpy kernel.

Correctness anchors are PUBLIC constants, not memorized samples:
- WGS84 quarter meridian = 10001965.7293 m (so northing at the pole on the
  central meridian must be k0 * that);
- scale on the central meridian at the equator = k0 * a * pi/180 per degree;
- round-trip self-consistency at nanometer level (Karney 2011 accuracy).
"""

import numpy as np

from geotrellis_contrib_ray.core import crs


def test_utm_roundtrip_nanometer():
    rng = np.random.default_rng(7)
    lon = -75.0 + rng.uniform(-3.0, 3.0, 2000)
    lat = rng.uniform(-80.0, 84.0, 2000)  # UTM's official latitude band
    t = crs.Transformer("EPSG:4326", "EPSG:32618")
    x, y = t.transform(lon, lat)
    lon2, lat2 = t.inverse().transform(x, y)
    # 1e-12 deg ~ 0.1 micrometer on the ground
    assert np.abs(lon2 - lon).max() < 1e-12
    assert np.abs(lat2 - lat).max() < 1e-12


def test_utm_central_meridian_and_symmetry():
    t = crs.Transformer("EPSG:4326", "EPSG:32618")  # lon0 = -75
    x, _ = t.transform(np.array([-75.0]), np.array([40.0]))
    assert abs(x[0] - 500000.0) < 1e-6  # false easting exactly on the CM
    xe, _ = t.transform(np.array([-74.0]), np.array([40.0]))
    xw, _ = t.transform(np.array([-76.0]), np.array([40.0]))
    assert abs((xe[0] - 500000.0) - (500000.0 - xw[0])) < 1e-6  # mirror


def test_utm_quarter_meridian_golden():
    # northing at the pole = k0 * WGS84 quarter meridian (public constant)
    t = crs.Transformer("EPSG:4326", "EPSG:32618")
    _, y = t.transform(np.array([-75.0]), np.array([90.0]))
    assert abs(y[0] - 0.9996 * 10001965.7293) < 1e-4


def test_utm_equator_scale_k0():
    t = crs.Transformer("EPSG:4326", "EPSG:32618")
    d = 1e-6
    x, _ = t.transform(np.array([-75.0, -75.0 + d]), np.array([0.0, 0.0]))
    m_per_deg = (x[1] - x[0]) / d
    expected = 0.9996 * np.pi / 180.0 * 6378137.0
    assert abs(m_per_deg - expected) / expected < 1e-6


def test_utm_south_false_northing():
    ts = crs.Transformer("EPSG:4326", "EPSG:32718")
    tn = crs.Transformer("EPSG:4326", "EPSG:32618")
    xs, ys = ts.transform(np.array([-75.0]), np.array([-1.0]))
    xn, yn = tn.transform(np.array([-75.0]), np.array([-1.0]))
    assert abs((ys[0] - 10000000.0) - yn[0]) < 1e-6  # same grid, shifted FN
    assert xs[0] == xn[0]


def test_utm_zone_codes():
    assert crs.utm_crs(18) == "EPSG:32618"
    assert crs.utm_crs(18, south=True) == "EPSG:32718"
    assert crs._parse_utm("EPSG:32618") == (-75.0, 0.0)
    assert crs._parse_utm("EPSG:32718") == (-75.0, 10000000.0)
    assert crs._parse_utm("EPSG:32661") is None  # UPS, not UTM
    assert crs._parse_utm("EPSG:3857") is None


def test_utm_via_mercator_chain():
    """4326 -> UTM -> 3857 -> 4326 composition stays consistent."""
    lon = np.array([-74.5, -75.5, -75.0])
    lat = np.array([40.0, 41.0, -10.0])
    a = crs.Transformer("EPSG:4326", "EPSG:32618")
    b = crs.Transformer("EPSG:32618", "EPSG:3857")
    c = crs.Transformer("EPSG:3857", "EPSG:4326")
    x, y = a.transform(lon, lat)
    mx, my = b.transform(x, y)
    lon2, lat2 = c.transform(mx, my)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_reproject_raster_source_to_utm(ray_session):
    """T1 through the view chain with the ellipsoidal UTM target: value
    round-trip 4326 -> 32618 -> 4326 must reproduce the source raster on
    the interior (nearest resampling, same pixel counts)."""
    import numpy as np

    from geotrellis_contrib_ray.core.grid import Extent, GridExtent
    from geotrellis_contrib_ray.sources.raster_source import SyntheticRasterSource

    # a small lon/lat grid inside zone 18
    grid = GridExtent(Extent(-76.0, 40.0, -74.0, 41.0), 0.02, 0.02, 100, 50)
    src = SyntheticRasterSource(grid, _crs="EPSG:4326")
    utm = src.reproject("EPSG:32618", method="nearest")
    assert utm.crs == "EPSG:32618"
    # target extent must bracket the forward-projected corners
    assert utm.extent.xmin < 500000.0 < utm.extent.xmax
    back = utm.reproject("EPSG:4326", method="nearest")
    a = src.read().pixels
    b = back.read().pixels
    # compare interior (edges differ by envelope padding); nearest-resample
    # round trip through the ellipsoidal warp keeps interior values
    inner_a = a[..., 10:-10, 10:-10]
    # sample the same geographic centers from the round-tripped view
    sub = back.read(
        Extent(
            grid.extent.xmin + 10 * grid.cellwidth,
            grid.extent.ymin + 10 * grid.cellheight,
            grid.extent.xmax - 10 * grid.cellwidth,
            grid.extent.ymax - 10 * grid.cellheight,
        )
    ).pixels
    assert sub.shape[-2:] <= a.shape[-2:]
    # majority of interior cells survive the double warp exactly (nearest)
    h = min(inner_a.shape[-2], sub.shape[-2]) - 1
    w = min(inner_a.shape[-1], sub.shape[-1]) - 1
    frac = (inner_a[..., :h, :w] == sub[..., :h, :w]).mean()
    assert frac > 0.5, frac


def test_lcc_albers_round_trip():
    """Conic forward -> inverse must recover lon/lat to sub-micro-degree
    over the CONUS box (Snyder closed forms are exact on the sphere)."""
    from geotrellis_contrib_ray.core.crs import (
        EPSG_4326,
        Transformer,
    )
    from geotrellis_contrib_ray.pipelines.query_defs import (
        albers_query_crs,
        lambert_query_crs,
    )

    rng = np.random.default_rng(7)
    lon = rng.uniform(-120, -70, 2000)
    lat = rng.uniform(25, 49, 2000)
    for crs in (lambert_query_crs(), albers_query_crs()):
        t = Transformer(EPSG_4326, crs)
        x, y = t.transform(lon, lat)
        lon2, lat2 = t.inverse().transform(x, y)
        assert np.max(np.abs(lon2 - lon)) < 1e-9
        assert np.max(np.abs(lat2 - lat)) < 1e-9


def test_lcc_albers_vs_duckdb_expressions():
    """The generated SQL expressions must agree with the numpy kernels to
    well under the cm-floor resolution over the geocode lattice."""
    import duckdb

    from geotrellis_contrib_ray.core.crs import EPSG_4326, Transformer
    from geotrellis_contrib_ray.pipelines.query_defs import (
        albers_query_crs,
        albers_sql_exprs,
        lambert_query_crs,
        lambert_sql_exprs,
    )
    from geotrellis_contrib_ray.sources.documents import geocode_ids

    ids = np.arange(5000, dtype=np.int64)
    lon, lat = geocode_ids(ids)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts AS SELECT * FROM pts_df",
                {"pts_df": None}) if False else None
    import pandas as pd

    con.register("pts", pd.DataFrame({"lon": lon, "lat": lat}))
    for crs, exprs in ((lambert_query_crs(), lambert_sql_exprs()),
                       (albers_query_crs(), albers_sql_exprs())):
        xs, ys = Transformer(EPSG_4326, crs).transform(lon, lat)
        q = con.execute(f"SELECT {exprs[0]} AS x, {exprs[1]} AS y FROM pts").df()
        assert np.max(np.abs(q["x"].to_numpy() - xs)) < 1e-4  # << 1 cm
        assert np.max(np.abs(q["y"].to_numpy() - ys)) < 1e-4


def test_stereo_sinusoidal_round_trip_and_sql():
    """Polar stereographic + sinusoidal: forward->inverse identity over
    their valid domains, and the generated SQL expressions agree with the
    numpy kernels to well under the cm floor."""
    import duckdb
    import pandas as pd

    from geotrellis_contrib_ray.core.crs import EPSG_4326, Transformer
    from geotrellis_contrib_ray.pipelines.query_defs import (
        sinu_query_crs,
        sinu_sql_exprs,
        stereo_query_crs,
        stereo_sql_exprs,
    )
    from geotrellis_contrib_ray.sources.documents import geocode_ids

    rng = np.random.default_rng(21)
    # stereographic: northern hemisphere; sinusoidal: anywhere non-polar
    lon = rng.uniform(-179.0, 179.0, 2000)
    lat_n = rng.uniform(5.0, 89.5, 2000)
    lat_all = rng.uniform(-85.0, 85.0, 2000)
    for crs, lats in ((stereo_query_crs(), lat_n), (sinu_query_crs(), lat_all)):
        t = Transformer(EPSG_4326, crs)
        x, y = t.transform(lon, lats)
        lon2, lat2 = t.inverse().transform(x, y)
        # wrap-safe lon compare (stereographic lam comes back in (-180,180])
        dlon = (lon2 - lon + 180.0) % 360.0 - 180.0
        assert np.max(np.abs(dlon)) < 1e-9
        assert np.max(np.abs(lat2 - lats)) < 1e-9

    ids = np.arange(5000, dtype=np.int64)
    glon, glat = geocode_ids(ids)
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"lon": glon, "lat": glat}))
    for crs, exprs in ((stereo_query_crs(), stereo_sql_exprs()),
                       (sinu_query_crs(), sinu_sql_exprs())):
        xs, ys = Transformer(EPSG_4326, crs).transform(glon, glat)
        q = con.execute(f"SELECT {exprs[0]} AS x, {exprs[1]} AS y FROM pts").df()
        assert np.max(np.abs(q["x"].to_numpy() - xs)) < 1e-4
        assert np.max(np.abs(q["y"].to_numpy() - ys)) < 1e-4
