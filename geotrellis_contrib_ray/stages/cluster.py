"""Distributed k-means over an embedding column (training-data curation:
cluster-balanced sampling, near-dup bucket seeding, topic discovery).

Scale shape (Lloyd's, Ray-Data-first):
* centroids are broadcast once per iteration (``ray.put``), never shipped
  per batch;
* the E-step + partial M-step run fused inside one ``map_batches`` pass:
  each batch emits k x d (cid, dim, s, n) partial rows — the ONLY thing
  crossing the shuffle is k*d*blocks tiny rows, never vectors;
* the global reduce is a groupby-sum of those partials; the driver holds
  exactly k x d floats (the centroids), independent of corpus size.

Determinism: assignment tie-break is (distance, cluster-id) — np.argmin
takes the FIRST minimum, matching the SQL oracle's ORDER BY dist, cid; an
emptied cluster keeps its previous centroid on BOTH sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import _embedding_matrix


def _assign(X: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Row -> nearest-centroid index (squared euclidean; first-min wins)."""
    # |x-c|^2 = |x|^2 - 2 x.c + |c|^2; |x|^2 constant per row — drop it
    d2 = -2.0 * (X @ cents.T) + (cents * cents).sum(axis=1)[None, :]
    return np.argmin(d2, axis=1)


def kmeans_fit(ds, init: np.ndarray, n_iter: int = 2,
               vec_col: str = "embedding", cache: bool = True) -> np.ndarray:
    """Lloyd's iterations over a Dataset; returns the (k, d) centroids.

    ``init``: explicit deterministic seeds (k, d) — at query level the first
    k vectors by id; callers wanting k-means++ can sample a block and seed
    driver-side (the fit itself never pulls the corpus to the driver).

    ``cache=True`` materializes the input into the object store once so the
    n_iter passes re-read blocks instead of re-running the source scan each
    round (Ray spills to disk if the table exceeds store memory — still
    cheaper than n_iter remote re-reads).  Pass False to re-scan lazily when
    even spill space is tight.
    """
    import ray

    from .agg import driver_group_rollup

    if cache:
        ds = ds.materialize()
    cents = np.ascontiguousarray(init, dtype=np.float64)
    k, dim = cents.shape
    for _ in range(n_iter):
        ref = ray.put(cents)

        def partials(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:  # empty blocks contribute zero partials
                z = pa.array([], pa.int64())
                return pa.table({"cid": z, "dim": z,
                                 "s": pa.array([], pa.float64()), "n": z})
            X = _embedding_matrix(batch[vec_col]).astype(np.float64)
            C = ray.get(ref)
            a = _assign(X, C)
            sums = np.zeros((k, dim), np.float64)
            np.add.at(sums, a, X)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            cid = np.repeat(np.arange(k, dtype=np.int64), dim)
            return pa.table({
                "cid": pa.array(cid),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), k)),
                "s": pa.array(sums.ravel()),
                "n": pa.array(np.repeat(counts, dim)),
            })

        # k*d groups per iteration — a BOUNDED count, so the M-step
        # combine is the driver-rollup tier: per-block partials funnel to
        # the driver with NO all-to-all per round (float sums accumulate in
        # a different order than any other engine, which the oracle already
        # tolerates — Voronoi-boundary caveat)
        agg = driver_group_rollup(
            ds.map_batches(partials, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None),
            ["cid", "dim"], [("s", "sum", "s"), ("n", "sum", "n")],
        )
        new = cents.copy()  # emptied clusters keep their previous centroid
        cid_a = agg["cid"].to_numpy()
        dim_a = agg["dim"].to_numpy()
        s_a = agg["s"].to_numpy()
        n_a = agg["n"].to_numpy()
        nz = n_a > 0
        new[cid_a[nz], dim_a[nz]] = s_a[nz] / n_a[nz]
        cents = new
    return cents


def kmeans_assign(ds, cents: np.ndarray, vec_col: str = "embedding",
                  id_col: str = "vec_id"):
    """Final E-step: (id, cluster) labels, centroids broadcast once."""
    import ray

    ref = ray.put(np.ascontiguousarray(cents, dtype=np.float64))

    def label(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        X = _embedding_matrix(batch[vec_col]).astype(np.float64)
        a = _assign(X, ray.get(ref))
        return pa.table({
            id_col: batch[id_col].combine_chunks().cast(pa.int64()),
            "cluster": pa.array(a.astype(np.int64)),
        })

    return ds.map_batches(label, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)


def kmeans_seed_plusplus(ds, k: int, sample_n: int = 2048,
                         vec_col: str = "embedding", seed: int = 0) -> np.ndarray:
    """k-means++ seeding over a BOUNDED sample (driver holds sample_n
    vectors, never the corpus; the fit itself stays distributed).
    Deterministic given ``seed`` — D^2-weighted picks via a seeded
    Generator.  Returns (k, d) float64 seeds for ``kmeans_fit``."""
    rows = ds.limit(sample_n).take_all()
    X = np.stack([np.asarray(r[vec_col], np.float64) for r in rows])
    rng = np.random.default_rng(seed)
    cents = [X[int(rng.integers(len(X)))]]
    for _ in range(k - 1):
        C = np.asarray(cents)
        d2 = np.min(((X[:, None, :] - C[None]) ** 2).sum(-1), axis=1)
        total = d2.sum()
        if total <= 0.0:  # degenerate sample: every point already a centroid
            cents.append(X[int(rng.integers(len(X)))])
            continue
        cents.append(X[int(rng.choice(len(X), p=d2 / total))])
    return np.asarray(cents)


def grouped_vector_sum(ds, group_col: str, vec_col: str = "embedding",
                       quant_bits: int = 20):
    """Grouped VECTOR aggregate (class centroids): per group, exact
    fixed-point component sums of the embedding column — the centroid
    partial any embedding-class pipeline (balanced sampling, per-class
    prototypes, drift monitors) reduces to.

    Floats quantize as floor(x * 2^quant_bits) (floor, not round — the
    CLAUDE.md rule numpy and DuckDB share), so sums are int64-exact and the
    SQL twin replays them bit-identically; the mean component is ONE shared
    double division over those exact integers.

    Scale shape: each batch emits only (groups_in_batch x d) partial rows —
    vectors never cross a shuffle; the total reduce is the bounded-groups
    driver tier (labels x dims is a small constant).  Output long format:
    (group_col, dim, sum_q, n_vecs, mean_q:float64)."""
    from .agg import driver_group_rollup

    scale = float(1 << quant_bits)

    def partial(b: pa.Table) -> pa.Table:
        g = b[group_col].to_numpy(zero_copy_only=False)
        if len(g) == 0:
            z = pa.array([], pa.int64())
            return pa.table({group_col: pa.array([], b.schema.field(group_col).type),
                             "dim": z, "ps": z, "pc": z})
        X = _embedding_matrix(b[vec_col])
        q = np.floor(X * scale).astype(np.int64)
        uniq, inv = np.unique(g, return_inverse=True)
        nu, d = len(uniq), q.shape[1]
        sums = np.zeros((nu, d), np.int64)
        np.add.at(sums, inv, q)
        cnt = np.bincount(inv, minlength=nu).astype(np.int64)
        return pa.table({
            group_col: pa.array(np.repeat(uniq, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), nu)),
            "ps": pa.array(sums.reshape(-1)),
            "pc": pa.array(np.repeat(cnt, d)),
        })

    part = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
    out = driver_group_rollup(
        part, [group_col, "dim"],
        [("ps", "sum", "sum_q"), ("pc", "sum", "n_vecs")])
    sq = out["sum_q"].to_numpy()
    nv = out["n_vecs"].to_numpy()
    mean_q = sq.astype(np.float64) / nv.astype(np.float64)
    return out.append_column("mean_q", pa.array(mean_q, pa.float64()))
