"""IVF ANN recall vs brute force."""

import numpy as np
import pyarrow as pa


def test_ivf_topk_recall(ray_session):
    import ray.data as rd

    from geotrellis_contrib_ray.stages.ann import IVFIndex, ann_ivf_topk, ann_topk

    rng = np.random.default_rng(9)
    n, d = 5000, 16
    emb = rng.standard_normal((n, d)).astype(np.float32)
    t = pa.table({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(emb)})
    queries = emb[:3].astype(np.float64)
    ds = rd.from_arrow(t)
    exact = ann_topk(ds, queries, k=10).to_pandas()
    approx = ann_ivf_topk(
        rd.from_arrow(t), queries, k=10, sample=emb[rng.choice(n, 500, replace=False)],
        n_lists=8, nprobe=4,
    ).to_pandas()
    # recall@10 across queries >= 0.5 with nprobe=half the lists
    hits = 0
    for q in range(3):
        e = set(exact[exact.query_id == q].vec_id)
        a = set(approx[approx.query_id == q].vec_id)
        hits += len(e & a)
    assert hits / 30 >= 0.5
    # the query vector itself (cosine 1.0) is always found: its own list is probed
    for q in range(3):
        assert q in set(approx[approx.query_id == q].vec_id)


def test_ivf_assign_deterministic():
    from geotrellis_contrib_ray.stages.ann import IVFIndex

    rng = np.random.default_rng(2)
    sample = rng.standard_normal((200, 8))
    a = IVFIndex(sample, n_lists=4).assign(sample)
    b = IVFIndex(sample, n_lists=4).assign(sample)
    assert np.array_equal(a, b)


def test_ann_exact_variants_agree_with_float_brute(ray_session):
    """ann_topk_exact (quantized-integer score) must return the same top-k
    SETS as float brute force up to quantization ties, and the exact
    LSH/IVF filters must keep every query vector (rank-1 self-retrieval)."""
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_contrib_ray.stages import ann

    rng = np.random.default_rng(3)
    emb = (rng.standard_normal((200, 32)) * 0.25).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(200, dtype=np.int64)),
        "embedding": pa.array([row for row in emb]),
    })
    queries = emb[:3].astype(np.float64)
    qids = np.arange(3, dtype=np.int64)

    exact = ann.ann_topk_exact(rd.from_arrow(t), queries, k=10, query_ids=qids).to_pandas()
    flt = ann.ann_topk(rd.from_arrow(t), queries, k=10).to_pandas()
    for qi in range(3):
        a = set(exact[exact["query_id"] == qi]["vec_id"])
        b = set(flt[flt["query_id"] == qi]["vec_id"])
        assert len(a) == 10 and len(a & b) >= 9  # quantization may flip a tie
        # rank 1 is the query itself (score 10^6)
        r1 = exact[(exact["query_id"] == qi) & (exact["rnk"] == 1)]
        assert r1["vec_id"].iloc[0] == qi

    lsh = ann.quantized_lsh_filter(rd.from_arrow(t), queries, n_planes=4).to_pandas()
    assert set(qids) <= set(lsh["vec_id"])
    ivf = ann.quantized_ivf_filter(rd.from_arrow(t), queries,
                                   seeds=emb[:8].astype(np.float64), nprobe=2).to_pandas()
    assert set(qids) <= set(ivf["vec_id"])


def test_ann_exact_empty_filter_result(ray_session):
    """Regression (round-3 self-review): blocks filtered to 0 rows must
    flow through the quantized scorer/filters (the (0,0) embedding matrix
    crashed the matmul)."""
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_contrib_ray.stages import ann

    rng = np.random.default_rng(8)
    emb = (rng.standard_normal((40, 16)) * 0.3).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(40, dtype=np.int64)),
                  "embedding": pa.array([row for row in emb])})
    queries = emb[:2].astype(np.float64)
    # many tiny blocks -> some blocks lose every row in the LSH filter
    ds = rd.from_arrow(t).repartition(16)
    filt = ann.quantized_lsh_filter(ds, queries, n_planes=6)
    out = ann.ann_topk_exact(filt, queries, k=5,
                             query_ids=np.array([0, 1])).to_pandas()
    assert set(out["query_id"]) == {0, 1}
    assert (out[out["rnk"] == 1].sort_values("query_id")["vec_id"].tolist()
            == [0, 1])
    ivf = ann.quantized_ivf_filter(ds, queries, seeds=emb[:4].astype(np.float64),
                                   nprobe=1)
    assert ivf.count() > 0
