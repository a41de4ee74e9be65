"""Sequence packing (distributed prefix sum) + hash-stratified splits."""

import numpy as np
import pyarrow as pa

from geotrellis_contrib_ray.stages.pack import (
    SAMPLE_HASH_M,
    SPLIT_A,
    SPLIT_MOD,
    SPLIT_P,
    pack_sequences,
    stratified_sample,
    train_val_test_split,
)


def _docs(n=500, seed=2):
    rng = np.random.default_rng(seed)
    texts = [" ".join(["w"] * int(k)) for k in rng.integers(1, 40, n)]
    return pa.table(
        {"doc_id": np.arange(n, dtype=np.int64), "text": pa.array(texts, pa.string())}
    )


def test_pack_sequences_matches_serial_oracle(ray_session):
    import ray.data as rd

    t = _docs()
    # small chunk_size so the global prefix sum crosses MANY chunk boundaries
    out = (
        pack_sequences(rd.from_arrow(t), budget=100, chunk_size=64)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    toks = np.array([s.count(" ") + 1 for s in t["text"].to_pylist()], dtype=np.int64)
    presum = np.concatenate([[0], np.cumsum(toks)[:-1]])
    exp_seq = presum // 100
    assert out["n_tokens"].to_numpy().tolist() == toks.tolist()
    assert out["seq_id"].to_numpy().tolist() == exp_seq.tolist()
    # sequences are contiguous id ranges and non-decreasing
    assert (np.diff(out["seq_id"].to_numpy()) >= 0).all()


def test_train_split_deterministic_and_stratified(ray_session):
    import ray.data as rd

    t = _docs(2000)
    out = train_val_test_split(rd.from_arrow(t)).to_pandas()
    bucket = (t["doc_id"].to_numpy() % SPLIT_P) * SPLIT_A % SPLIT_MOD
    exp = np.where(bucket < 10, "test", np.where(bucket < 20, "val", "train"))
    assert out.sort_values("doc_id")["split"].tolist() == exp.tolist()
    frac = (out["split"] == "train").mean()
    assert 0.7 < frac < 0.9  # ~80% train
    # rerun identical
    out2 = train_val_test_split(rd.from_arrow(t)).to_pandas()
    assert out.sort_values("doc_id")["split"].tolist() == out2.sort_values("doc_id")["split"].tolist()


def test_stratified_sample_matches_serial_draw(ray_session):
    import ray.data as rd

    n, k = 1200, 7
    ids = np.arange(n, dtype=np.int64)
    groups = np.array(["g%d" % (i % 5) for i in range(n)])
    t = pa.table({"doc_id": ids, "lang": pa.array(groups, pa.string())})

    out = (
        stratified_sample(rd.from_arrow(t), group_col="lang", k=k)
        .to_pandas()
        .sort_values(["lang", "hkey", "doc_id"])
        .reset_index(drop=True)
    )

    h = (ids % SPLIT_P) * SPLIT_A % SAMPLE_HASH_M
    expected = []
    for g in sorted(set(groups)):
        mask = groups == g
        order = np.lexsort((ids[mask], h[mask]))
        for j in order[:k]:
            expected.append((g, int(h[mask][j]), int(ids[mask][j])))
    got = list(out[["lang", "hkey", "doc_id"]].itertuples(index=False, name=None))
    assert got == expected
    # exactly k winners per group, every group covered
    assert out.groupby("lang").size().tolist() == [k] * 5
    # deterministic across reruns
    out2 = (
        stratified_sample(rd.from_arrow(t), group_col="lang", k=k)
        .to_pandas()
        .sort_values(["lang", "hkey", "doc_id"])
        .reset_index(drop=True)
    )
    assert got == list(out2[["lang", "hkey", "doc_id"]].itertuples(index=False, name=None))


def test_chunk_documents_matches_python_reference(ray_session):
    import ray.data as rd

    from geotrellis_contrib_ray.stages.pack import chunk_documents

    size, stride = 160, 120
    texts = ["", "a" * 5, "b" * 120, "c" * 121, "x" * 160, "hello world " * 40,
             "héllo wörld " * 15, "y" * 280, "z"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = (
        chunk_documents(rd.from_arrow(t), size=size, stride=stride)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    exp = []
    for i, txt in enumerate(texts):
        for j in range((len(txt) - 1) // stride + 1 if txt else 0):
            c = txt[j * stride : j * stride + size]
            exp.append((i, j, len(c), c))
    got = list(out[["doc_id", "chunk_id", "chunk_len", "chunk_text"]]
               .itertuples(index=False, name=None))
    assert got == exp
    # overlap invariant: consecutive chunks of the same doc share size-stride chars
    for (i1, j1, _, c1), (i2, j2, _, c2) in zip(exp, exp[1:]):
        if i1 == i2 and len(c1) == size:
            assert c1[stride:] == c2[: size - stride]


def test_global_shuffle_deterministic_epochs(ray_session):
    import ray.data as rd

    from geotrellis_contrib_ray.stages.pack import (
        EPOCH_C, SHUF_A, SHUF_M, SPLIT_P, global_shuffle,
    )

    ids = np.arange(200, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids)})
    e0 = global_shuffle(rd.from_arrow(t), epoch=0).to_pandas()
    e0b = global_shuffle(rd.from_arrow(t), epoch=0).to_pandas()
    e1 = global_shuffle(rd.from_arrow(t), epoch=1).to_pandas()
    # reproducible within an epoch, different across epochs
    assert e0["doc_id"].tolist() == e0b["doc_id"].tolist()
    assert e0["doc_id"].tolist() != e1["doc_id"].tolist()
    # matches the hash formula order exactly
    for epoch, df in ((0, e0), (1, e1)):
        h = (((ids + epoch * EPOCH_C) % SPLIT_P) * SHUF_A) % SHUF_M
        order = np.lexsort((ids, h))
        assert df["doc_id"].tolist() == ids[order].tolist()
        assert df["shuffle_key"].tolist() == h[order].tolist()
    # a permutation, not a sample
    assert sorted(e1["doc_id"].tolist()) == ids.tolist()


def test_pack_sequences_hierarchical_levels(ray_session):
    """Forced tiny chunk/super sizes so the 3-level prefix sum exercises >= 2
    hierarchy levels (125 chunks, 32 super-chunks at n=500): results must
    equal the serial global cumsum, and the driver-held level is the
    super-chunk table only (VERDICT r2 #4)."""
    import ray.data as rd

    rng = np.random.default_rng(5)
    n = 500
    texts = [" ".join(["w"] * int(k)) for k in rng.integers(1, 40, n)]
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "text": pa.array(texts, pa.string())})
    got = (
        pack_sequences(rd.from_arrow(t), budget=100, chunk_size=4, super_size=4,
                       driver_chunk_rows=0)  # force the hierarchical tier
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    toks = np.array([len(x.split(" ")) for x in texts], np.int64)
    presum = np.concatenate([[0], np.cumsum(toks)[:-1]])
    assert got["doc_id"].tolist() == list(range(n))
    assert got["n_tokens"].tolist() == toks.tolist()
    assert got["seq_id"].tolist() == (presum // 100).tolist()


def test_mixture_sample_budget_prefix(ray_session):
    """Per-source docs are taken in (sample-hash, id) order until the token
    budget is crossed; the boundary doc is included; python oracle parity."""
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_contrib_ray.stages.pack import (
        SAMPLE_HASH_M,
        SPLIT_A,
        SPLIT_P,
        mixture_sample,
    )

    rng = np.random.default_rng(13)
    rows = []
    for d in range(120):
        src = f"s{d % 3}"
        n = int(rng.integers(1, 12))
        rows.append((d, src, " ".join(["w"] * n)))
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "source": pa.array([r[1] for r in rows], pa.string()),
                  "text": pa.array([r[2] for r in rows], pa.string())})
    budget = 60
    out = (mixture_sample(rd.from_arrow(t), budget_tokens=budget)
           .to_pandas().sort_values(["source", "presum"]).reset_index(drop=True))

    # python oracle
    exp = []
    by_src: dict = {}
    for d, src, txt in rows:
        h = ((d % SPLIT_P) * SPLIT_A) % SAMPLE_HASH_M
        by_src.setdefault(src, []).append((h, d, txt.count(" ") + 1))
    for src, docs in by_src.items():
        run = 0
        for h, d, nt in sorted(docs):
            if run < budget:
                exp.append((src, d, nt, run))
            run += nt
    got = [(r.source, int(r.doc_id), int(r.n_tokens), int(r.presum))
           for r in out.itertuples()]
    assert sorted(got) == sorted(exp)
    # each source's kept tokens just crosses the budget
    for src in by_src:
        kept = out[out["source"] == src]
        tot = int(kept["n_tokens"].sum())
        assert tot >= min(budget, sum(nt for _, _, nt in by_src[src]))


def test_mixture_sample_parquet_tier_parity(ray_session, tmp_path):
    """r5: the parquet-persist tier (large-scale path, no corpus-wide
    object-store pin) must return byte-identical results to the materialize
    tier, and the auto tier must select by approx_rows vs materialize_limit."""
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_contrib_ray.stages.pack import mixture_sample

    rng = np.random.default_rng(29)
    n = 150
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "source": pa.array([f"s{int(i) % 4}" for i in range(n)], pa.string()),
        "text": pa.array([" ".join(["tok"] * int(rng.integers(1, 9)))
                          for _ in range(n)], pa.string()),
    })
    budget = 40

    def run(**kw):
        return (mixture_sample(rd.from_arrow(t), budget_tokens=budget, **kw)
                .to_pandas().sort_values(["source", "doc_id"])
                .reset_index(drop=True))

    mat = run(tier="materialize")
    par = run(tier="parquet", spill_dir=str(tmp_path / "spill"))
    assert mat.equals(par)
    # auto tier: approx_rows above the limit routes to parquet (observable
    # via the spill dir being populated), below keeps the object store
    auto_dir = tmp_path / "auto_spill"
    auto = run(tier="auto", approx_rows=10_000, materialize_limit=100,
               spill_dir=str(auto_dir))
    assert auto.equals(mat)
    assert any(auto_dir.iterdir())
    small_dir = tmp_path / "small_spill"
    small = run(tier="auto", approx_rows=10, materialize_limit=100,
                spill_dir=str(small_dir))
    assert small.equals(mat)
    assert not small_dir.exists() or not any(small_dir.iterdir())
