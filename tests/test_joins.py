import numpy as np
import pyarrow as pa
import pytest

from geotrellis_contrib_ray.stages.joins import bucketed_hash_join, native_hash_join


def _sides():
    import ray.data as rd

    rng = np.random.default_rng(5)
    left = pa.table(
        {
            "k": rng.integers(0, 500, 5000).astype(np.int64),
            "v": np.arange(5000, dtype=np.int64),
        }
    )
    right = pa.table(
        {
            "k": np.arange(500, dtype=np.int64),
            "w": (np.arange(500, dtype=np.int64) * 10),
        }
    )
    return rd.from_arrow(left), rd.from_arrow(right), left, right


def test_bucketed_join_matches_pandas(ray_session):
    lds, rds, lt, rt = _sides()
    got = (
        bucketed_hash_join(lds, rds, on="k", buckets=8)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    exp = (
        lt.to_pandas()
        .merge(rt.to_pandas(), on="k")
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    assert got[["k", "v", "w"]].astype(np.int64).equals(exp[["k", "v", "w"]].astype(np.int64))


def test_native_join_same_result(ray_session):
    lds, rds, lt, rt = _sides()
    got = (
        native_hash_join(lds, rds, on="k", num_partitions=4)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    exp = (
        lt.to_pandas().merge(rt.to_pandas(), on="k").sort_values(["k", "v"]).reset_index(drop=True)
    )
    assert got[["k", "v", "w"]].astype(np.int64).equals(exp[["k", "v", "w"]].astype(np.int64))


def test_bucketed_join_preserves_dtypes(ray_session):
    """Regression: the pandas per-bucket merge used to null-pad int64 columns
    and hand back float64 (the order_lineitem_join driver hash-fail)."""
    lds, rds, _, _ = _sides()
    out = bucketed_hash_join(lds, rds, on="k", buckets=8).to_pandas()
    assert out["v"].dtype == np.int64
    assert out["w"].dtype == np.int64


def test_asof_join_float_right_value(ray_session):
    """Regression: asof_join hardcoded int64 null-padding; a float right
    value column must survive with its own dtype."""
    import ray.data as rd

    from geotrellis_contrib_ray.stages.joins import asof_join

    left = rd.from_arrow(
        pa.table({"u": [1, 1, 2], "t": [10, 20, 15]})
    )
    right = rd.from_arrow(
        pa.table({"u": [1, 1, 2], "t": [5, 18, 3], "score": [0.5, 1.5, 2.5]})
    )
    out = (
        asof_join(left, right, by="u", on="t", right_value="score", buckets=4)
        .to_pandas()
        .sort_values(["u", "t"])
        .reset_index(drop=True)
    )
    assert out["score"].dtype == np.float64
    assert out["score"].tolist() == [0.5, 1.5, 2.5]


def test_shared_column_guard(ray_session):
    import ray.data as rd

    a = rd.from_arrow(pa.table({"k": [1], "x": [1]}))
    b = rd.from_arrow(pa.table({"k": [1], "x": [2]}))
    with pytest.raises(ValueError, match="rename shared"):
        bucketed_hash_join(a, b, on="k")


def _interval_fixture():
    import pyarrow as pa
    import ray.data as rd

    # values chosen to hit closed boundaries and the overlap zone of
    # [0,4] / [3,7] / [10,14]
    pts = pa.table({"event_id": [1, 2, 3, 4, 5, 6],
                    "value": [0.0, 3.5, 4.0, 7.0, 9.0, 14.0]})
    ivals = [(0, 0.0, 4.0), (1, 3.0, 7.0), (2, 10.0, 14.0)]
    expected = sorted([(1, 0), (2, 0), (2, 1), (3, 0), (3, 1), (4, 1), (6, 2)])
    return rd.from_arrow(pts), ivals, expected


def test_interval_join_broadcast_closed_bounds_and_overlap(ray_session):
    from geotrellis_contrib_ray.stages.joins import interval_join

    ds, ivals, expected = _interval_fixture()
    out = interval_join(ds, ivals, on="value").to_pandas()
    got = sorted(zip(out["event_id"], out["interval_id"]))
    assert got == expected


def test_interval_join_bucketed_matches_broadcast(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_contrib_ray.stages.joins import interval_join_bucketed

    ds, ivals, expected = _interval_fixture()
    ivds = rd.from_arrow(pa.table({
        "interval_id": [i for i, _, _ in ivals],
        "lo": [lo for _, lo, _ in ivals],
        "hi": [hi for _, _, hi in ivals],
    }))
    # bucket_width smaller than interval length exercises replication
    out = interval_join_bucketed(ds, ivds, on="value", bucket_width=2.0).to_pandas()
    got = sorted(zip(out["event_id"], out["interval_id"]))
    assert got == expected


def test_interval_join_random_parity(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_contrib_ray.stages.joins import interval_join, interval_join_bucketed

    rng = np.random.default_rng(3)
    v = rng.uniform(-10, 110, 3000)
    ds = rd.from_arrow(pa.table({"event_id": np.arange(3000), "value": v}))
    lo = rng.uniform(-5, 100, 60)
    ivals = [(i, float(l), float(l + w)) for i, (l, w) in
             enumerate(zip(lo, rng.uniform(0.1, 12.0, 60)))]
    exp = set()
    for i, l, h in ivals:
        for e in np.nonzero((v >= l) & (v <= h))[0]:
            exp.add((int(e), i))
    got_b = interval_join(ds, ivals, on="value").to_pandas()
    assert set(zip(got_b["event_id"], got_b["interval_id"])) == exp
    ivds = rd.from_arrow(pa.table({
        "interval_id": [i for i, _, _ in ivals],
        "lo": [l for _, l, _ in ivals],
        "hi": [h for _, _, h in ivals],
    }))
    got_s = interval_join_bucketed(ds, ivds, on="value", bucket_width=7.0).to_pandas()
    assert set(zip(got_s["event_id"], got_s["interval_id"])) == exp


def test_box_join_reference_point_dedup(ray_session):
    """Boxes spanning MANY replication cells must emit each pair exactly
    once (reference-point rule), including touching-edge (closed) matches."""
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_contrib_ray.stages.spatial import box_join

    left = rd.from_arrow(pa.table({
        "id": [1, 2],
        "x0": [0.0, 10.0], "y0": [0.0, 10.0],
        "x1": [9.0, 12.0], "y1": [9.0, 12.0],   # box 1 spans 100 cells at cell=1
    }))
    right = rd.from_arrow(pa.table({
        "id": [7, 8, 9],
        "x0": [5.0, 9.0, 20.0], "y0": [5.0, 9.0, 20.0],
        # 8 = [9,10]^2: touches box 1's edge at x=9 and box 2's corner (10,10)
        "x1": [6.0, 10.0, 21.0], "y1": [6.0, 10.0, 21.0],
    }))
    out = box_join(left, right, cell=1.0).to_pandas()
    got = sorted(zip(out["left_id"], out["right_id"]))
    assert got == [(1, 7), (1, 8), (2, 8)]


def test_box_join_random_parity(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_contrib_ray.stages.spatial import box_join

    rng = np.random.default_rng(8)
    def mk(n, seed_off, wmax):
        x0 = rng.uniform(-50, 50, n); y0 = rng.uniform(-50, 50, n)
        w = rng.uniform(0.1, wmax, n); h = rng.uniform(0.1, wmax, n)
        return np.arange(n) + seed_off, x0, y0, x0 + w, y0 + h

    lid, lx0, ly0, lx1, ly1 = mk(400, 0, 8.0)
    rid, rx0, ry0, rx1, ry1 = mk(300, 1000, 5.0)
    lds = rd.from_arrow(pa.table({"id": lid, "x0": lx0, "y0": ly0, "x1": lx1, "y1": ly1}))
    rds = rd.from_arrow(pa.table({"id": rid, "x0": rx0, "y0": ry0, "x1": rx1, "y1": ry1}))
    out = box_join(lds, rds, cell=3.0).to_pandas()
    got = sorted(zip(out["left_id"], out["right_id"]))
    hit = ((lx0[:, None] <= rx1[None, :]) & (lx1[:, None] >= rx0[None, :])
           & (ly0[:, None] <= ry1[None, :]) & (ly1[:, None] >= ry0[None, :]))
    exp = sorted((int(lid[i]), int(rid[j])) for i, j in zip(*np.nonzero(hit)))
    assert got == exp


def test_bucketed_join_string_key(ray_session):
    """String join keys bucket by the FNV hash (not int coercion) — parity
    with a pandas merge on a word-keyed pair of tables."""
    import pandas as pd
    import ray.data as rd

    from geotrellis_contrib_ray.stages.joins import bucketed_hash_join

    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    left = pa.table({"term": pa.array([words[i % 5] for i in range(40)]),
                     "lval": pa.array(list(range(40)), pa.int64())})
    right = pa.table({"term": pa.array(words[:4]),
                      "rval": pa.array([10, 20, 30, 40], pa.int64())})
    out = bucketed_hash_join(rd.from_arrow(left), rd.from_arrow(right),
                             on="term", buckets=8).to_pandas()
    exp = pd.merge(left.to_pandas(), right.to_pandas(), on="term")
    key = lambda df: df.sort_values(["term", "lval"]).reset_index(drop=True)
    got = key(out)[["term", "lval", "rval"]]
    expd = key(exp)[["term", "lval", "rval"]]
    assert got.equals(expd)
    assert got["rval"].dtype == np.int64


def test_bloom_semi_join_exact(ray_session):
    import ray.data as rd

    from geotrellis_contrib_ray.stages.joins import bloom_semi_join

    rng = np.random.default_rng(5)
    lkeys = rng.integers(0, 1000, 5000).astype(np.int64)
    rkeys = rng.choice(1000, 120, replace=False).astype(np.int64)
    left = rd.from_arrow(pa.table({"k": pa.array(lkeys), "v": pa.array(np.arange(5000))}))
    right = rd.from_arrow(pa.table({"k": pa.array(rkeys)}))
    out = bloom_semi_join(left, right, on="k", buckets=8).to_pandas()
    keep = set(rkeys.tolist())
    exp = sorted(v for k, v in zip(lkeys, range(5000)) if k in keep)
    assert sorted(out["v"]) == exp


def test_bloom_semi_join_tiny_filter_still_exact(ray_session):
    """bits_log2=8 (256 bits) forces bloom false positives; the verify join
    must still produce the exact semi-join."""
    import ray.data as rd

    from geotrellis_contrib_ray.stages.joins import bloom_semi_join

    lkeys = np.arange(2000, dtype=np.int64)
    rkeys = np.arange(0, 2000, 97, dtype=np.int64)  # 21 keys
    left = rd.from_arrow(pa.table({"k": pa.array(lkeys), "v": pa.array(lkeys * 3)}))
    right = rd.from_arrow(pa.table({"k": pa.array(rkeys)}))
    out = bloom_semi_join(left, right, on="k", bits_log2=8, buckets=4).to_pandas()
    assert sorted(out["k"]) == sorted(rkeys.tolist())


def test_asof_join_keeps_matched_null_value(ray_session):
    """A left row that asof-matches a right row whose VALUE is null must
    survive with the null (SQL ASOF JOIN semantics) — matched-ness is not
    value non-nullness."""
    import ray.data as rd

    from geotrellis_contrib_ray.stages.joins import asof_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()), "t": pa.array([6, 6], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()), "t": pa.array([5, 5], pa.int64()),
        "v": pa.array([None, 3.5], pa.float64()),
    }))
    out = asof_join(left, right, by="k", on="t", right_value="v").to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert len(out) == 2
    assert np.isnan(out["v"][0]) and out["v"][1] == 3.5


def test_interval_join_empty_intervals(ray_session):
    import ray.data as rd

    from geotrellis_contrib_ray.stages.joins import interval_join

    pts = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2], pa.int64()), "t": pa.array([1.0, 2.0]),
    }))
    out = interval_join(pts, [], on="t")
    assert out.count() == 0


def test_skew_aware_join_matches_bucketed(ray_session):
    """Adversarially skewed key space (one key holds half the left rows):
    the salted tier must produce the identical multiset to the plain
    bucketed join, with the hot key's work spread across salt groups."""
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_contrib_ray.stages.joins import bucketed_hash_join, skew_aware_join

    rng = np.random.default_rng(21)
    n = 4000
    keys = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 500, n)).astype(np.int64)
    left = pa.table({"k": pa.array(keys), "v": pa.array(np.arange(n, dtype=np.int64))})
    rkeys = np.arange(0, 500, dtype=np.int64)
    right = pa.table({"k": pa.array(rkeys), "w": pa.array(rkeys * 10)})

    a = bucketed_hash_join(rd.from_arrow(left), rd.from_arrow(right), on="k").to_pandas()
    b = skew_aware_join(rd.from_arrow(left), rd.from_arrow(right), on="k",
                        hot_threshold=100, salt=8).to_pandas()
    cols = ["k", "v", "w"]
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == n  # every left row matches exactly one right row
    assert a.equals(b)


def test_skew_aware_join_right_duplicates(ray_session):
    """Hot keys with MULTIPLE right rows: each left row matches every right
    row exactly once (replication must not double-emit across salts)."""
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_contrib_ray.stages.joins import skew_aware_join

    left = pa.table({"k": pa.array([1] * 50 + [2] * 3, pa.int64()),
                     "v": pa.array(np.arange(53, dtype=np.int64))})
    right = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                      "w": pa.array([10, 11, 20], pa.int64())})
    out = skew_aware_join(rd.from_arrow(left), rd.from_arrow(right), on="k",
                          hot_threshold=10, salt=4).to_pandas()
    assert len(out) == 50 * 2 + 3
    assert sorted(out[out["k"] == 1]["w"].tolist()) == [10] * 50 + [11] * 50


def test_bucketed_anti_join_planted(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_contrib_ray.stages.joins import bucketed_anti_join

    left = pa.table({"k": pa.array([1, 2, 3, 4, 2], pa.int64()),
                     "v": pa.array([10, 20, 30, 40, 21], pa.int64())})
    right = pa.table({"k": pa.array([2, 4, 4, 9], pa.int64())})
    out = (bucketed_anti_join(rd.from_arrow(left), rd.from_arrow(right), on="k")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["k"].tolist() == [1, 3]
    assert out["v"].tolist() == [10, 30]


def test_skew_join_subsampled_census_tolerance(ray_session):
    """r5: the subsampled census (deterministic prime-stride row sample +
    scaled threshold) must still catch a genuinely hot key, and hot-set
    errors in EITHER direction must never change the result multiset —
    salting only redistributes work."""
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_contrib_ray.stages.joins import bucketed_hash_join, skew_aware_join
    from geotrellis_contrib_ray.stages.skew import detect_hot_keys

    rng = np.random.default_rng(5)
    n = 30_000
    # key 7 holds ~half the rows; everything else is spread over 1000 keys
    keys = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 1000, n)).astype(np.int64)
    left = pa.table({"k": pa.array(keys), "v": pa.array(np.arange(n, dtype=np.int64))})
    rkeys = np.arange(0, 1000, dtype=np.int64)
    right = pa.table({"k": pa.array(rkeys), "w": pa.array(rkeys * 10)})

    # the sampled census catches the planted hot key with the caller's
    # scaled threshold (hot_threshold=10_000 -> stride 97, cut ~51)
    hot = detect_hot_keys(rd.from_arrow(left), ["k"], max(1, 10_000 // (2 * 97)),
                          sample_every=97)
    assert 7 in hot

    cols = ["k", "v", "w"]

    def norm(df):
        return df[cols].sort_values(cols).reset_index(drop=True)

    base = norm(bucketed_hash_join(rd.from_arrow(left), rd.from_arrow(right),
                                   on="k").to_pandas())
    # default auto-subsampled census path
    sampled = norm(skew_aware_join(rd.from_arrow(left), rd.from_arrow(right),
                                   on="k", hot_threshold=10_000, salt=8).to_pandas())
    assert base.equals(sampled)
    # deliberately WRONG hot sets: empty (hot key missed) and a cold key
    # marked hot (false positive) — identical results both ways
    missed = norm(skew_aware_join(rd.from_arrow(left), rd.from_arrow(right),
                                  on="k", hot_threshold=10_000, salt=8,
                                  hot_keys=set()).to_pandas())
    assert base.equals(missed)
    wrong = norm(skew_aware_join(rd.from_arrow(left), rd.from_arrow(right),
                                 on="k", hot_threshold=10_000, salt=8,
                                 hot_keys={3, 11}).to_pandas())
    assert base.equals(wrong)


def test_customer_order_totals_tier_parity(ray_session):
    """r5: the star-schema broadcast tier (zero shuffles) must equal the
    two-join chain tier row-for-row, and auto must pick broadcast under the
    footer-row gate."""
    import __ray_entry__ as e
    from conftest import SF_DIR

    def norm(res):
        import pandas as pd
        import pyarrow as pa

        df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
        return (df[sorted(df.columns)]
                .sort_values("c_mktsegment").reset_index(drop=True))

    bc = norm(e.q_customer_order_totals(SF_DIR, tier="broadcast"))
    ch = norm(e.q_customer_order_totals(SF_DIR, tier="chain"))
    assert bc.equals(ch)
    auto = norm(e.q_customer_order_totals(SF_DIR, tier="auto"))
    assert auto.equals(ch)


def test_full_outer_with_both_side_pre_agg(ray_session):
    """how='outer' + left_pre_agg + right_pre_agg: per-key partials from
    MULTIPLE batches combine per side before the merge; exclusive keys on
    either side survive with typed nulls on the other side's columns."""
    import pandas as pd
    import ray.data as rd

    # left keys {1,2,3}, right keys {2,3,4}; partials split across blocks
    left = pa.table({"k": pa.array([1, 2, 2, 3], pa.int64()),
                     "a": pa.array([10, 1, 2, 5], pa.int64())})
    right = pa.table({"k": pa.array([2, 3, 3, 4], pa.int64()),
                      "b": pa.array([7, 100, 200, 9], pa.int64())})
    lds = rd.from_arrow(left).repartition(3)
    rds = rd.from_arrow(right).repartition(3)
    got = (bucketed_hash_join(
        lds, rds, on="k", how="outer", buckets=4,
        left_pre_agg={"a": "sum"}, right_pre_agg={"b": "sum"},
        schemas=(left.schema, right.schema))
        .to_pandas().sort_values("k").reset_index(drop=True))
    exp = pd.DataFrame({
        "k": [1, 2, 3, 4],
        "a": [10.0, 3.0, 5.0, np.nan],
        "b": [np.nan, 7.0, 300.0, 9.0],
    })
    assert got["k"].tolist() == exp["k"].tolist()
    for c in ("a", "b"):
        assert np.array_equal(got[c].astype(np.float64).to_numpy(),
                              exp[c].to_numpy(), equal_nan=True), c


def test_left_pre_agg_validation(ray_session):
    lds, rds, lt, rt = _sides()
    with pytest.raises(ValueError, match="left_pre_agg"):
        bucketed_hash_join(lds, rds, on="k",
                           left_pre_agg={"nope": "sum"},
                           schemas=(lt.schema, rt.schema))
