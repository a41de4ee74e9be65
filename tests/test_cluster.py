"""Distributed k-means (stages/cluster.py) vs a pure-numpy Lloyd's oracle."""

import numpy as np
import pyarrow as pa

from geotrellis_contrib_ray.stages.cluster import kmeans_assign, kmeans_fit


def _numpy_lloyd(X, seeds, n_iter):
    C = seeds.astype(np.float64).copy()
    for _ in range(n_iter):
        d2 = ((X[:, None, :] - C[None]) ** 2).sum(-1)
        a = np.argmin(d2, axis=1)
        for c in range(len(C)):
            if (a == c).any():
                C[c] = X[a == c].mean(axis=0)
    return C


def _make_ds(X):
    import ray

    t = pa.table({
        "vec_id": pa.array(np.arange(len(X), dtype=np.int64)),
        "embedding": pa.array([row.tolist() for row in X.astype(np.float32)],
                              pa.list_(pa.float32())),
    })
    return ray.data.from_arrow(t).repartition(3)


def test_kmeans_matches_numpy_lloyd(ray_session):
    rng = np.random.default_rng(11)
    X = np.concatenate([
        rng.normal(0.0, 0.3, (60, 8)),
        rng.normal(3.0, 0.3, (70, 8)),
        rng.normal(-3.0, 0.3, (50, 8)),
    ]).astype(np.float32).astype(np.float64)
    seeds = X[:3]
    ds = _make_ds(X)
    C = kmeans_fit(ds, seeds, n_iter=3)
    C_ref = _numpy_lloyd(X, seeds, 3)
    assert np.allclose(C, C_ref, atol=1e-9)

    labels = kmeans_assign(ds, C).to_pandas().sort_values("vec_id")
    a_ref = np.argmin(((X[:, None, :] - C_ref[None]) ** 2).sum(-1), axis=1)
    assert np.array_equal(labels["cluster"].to_numpy(), a_ref)


def test_kmeans_empty_cluster_keeps_seed(ray_session):
    """A seed far from every point keeps its centroid instead of NaN-ing."""
    X = np.array([[0.0, 0.0], [0.1, 0.0], [0.0, 0.1], [1.0, 1.0]])
    seeds = np.array([[0.0, 0.0], [100.0, 100.0]])
    ds = _make_ds(X)
    C = kmeans_fit(ds, seeds, n_iter=2)
    assert np.allclose(C[1], [100.0, 100.0])
    assert np.isfinite(C).all()


def test_kmeans_plusplus_seeds_find_blobs(ray_session):
    """D^2 seeding lands one seed per well-separated blob, so two Lloyd's
    rounds recover the blob structure."""
    rng = np.random.default_rng(3)
    centers = np.array([[0.0, 0.0], [8.0, 8.0], [-8.0, 8.0]])
    X = np.concatenate([rng.normal(c, 0.2, (50, 2)) for c in centers])
    from geotrellis_contrib_ray.stages.cluster import kmeans_seed_plusplus

    ds = _make_ds(X)
    seeds = kmeans_seed_plusplus(ds, 3, sample_n=150, seed=1)
    C = kmeans_fit(ds, seeds, n_iter=2)
    # each true center has one learned centroid within 0.2
    d = np.sqrt(((C[:, None, :] - centers[None]) ** 2).sum(-1))
    assert (d.min(axis=0) < 0.2).all()


def test_grouped_vector_sum_exact(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_contrib_ray.stages.cluster import grouped_vector_sum

    rng = np.random.default_rng(11)
    n, d = 300, 8
    X = rng.normal(size=(n, d)).astype(np.float32)
    lab = rng.integers(0, 3, n).astype(np.int32)
    t = pa.table({"label": pa.array(lab),
                  "embedding": pa.array(list(X), pa.list_(pa.float32()))})
    out = (grouped_vector_sum(rd.from_arrow(t), "label", quant_bits=20)
           .to_pandas().sort_values(["label", "dim"]).reset_index(drop=True))
    q = np.floor(X.astype(np.float64) * float(1 << 20)).astype(np.int64)
    for g in range(3):
        sel = out[out["label"] == g]
        exp = q[lab == g].sum(axis=0)
        assert sel["sum_q"].to_numpy().tolist() == exp.tolist()
        assert (sel["n_vecs"] == (lab == g).sum()).all()
        assert np.array_equal(sel["mean_q"].to_numpy(),
                              exp.astype(np.float64) / float((lab == g).sum()))
