"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale pattern (per the Ray Data aggregation guidance): hash/sketch per batch
(narrow, vectorized), shuffle only the small (key, id) projection, resolve
groups with groupby; never move document bodies through the shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Exact duplicate groups: hash-partition on the text, per-group first id
    + count.  Partial per-batch aggregation collapses in-batch duplicates
    before the shuffle; the shuffled payload is (text, min_id, cnt).

    Output: text, first_doc (min id), n_copies.
    SQL twin: SELECT text, min(doc_id) first_doc, count(*) n_copies GROUP BY text.
    """

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([text_col, id_col]).group_by(text_col, use_threads=False).aggregate(
            [(id_col, "min"), (id_col, "count")]
        )
        return g.rename_columns([text_col, "pmin", "pcnt"])

    from ray.data.aggregate import Min, Sum

    part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None,)
    return part.groupby(text_col).aggregate(
        Min("pmin", alias_name="first_doc"), Sum("pcnt", alias_name="n_copies")
    )


def exact_dedup_keep_first(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep one row per distinct text (the min-id row): groupby(fingerprint)
    -> per-group head(1) after an in-batch fingerprint (no text shuffled)."""
    from .text import add_fingerprint

    with_fp = ds.map_batches(add_fingerprint, batch_format="pyarrow", zero_copy_batch=True, batch_size=None,)

    def first(g):
        return g.sort_values(id_col, kind="mergesort").head(1)

    return with_fp.groupby("fingerprint").map_groups(first, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(texts: pa.Array, k: int) -> list[np.ndarray]:
    """Per-row arrays of k-byte-shingle hashes (rolling polynomial, vectorized
    across rows via the shared utf8 buffer)."""
    texts = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    n = len(texts)
    if n == 0:
        return []
    offs = np.frombuffer(texts.buffers()[1], dtype=np.int32)[
        texts.offset : texts.offset + n + 1
    ].astype(np.int64)
    data_buf = texts.buffers()[2]
    data = np.frombuffer(data_buf, dtype=np.uint8) if data_buf is not None else np.zeros(0, np.uint8)
    if len(data) == 0:
        return [np.zeros(0, np.uint64) for _ in range(n)]
    # rolling hash over the whole buffer, then slice per row
    base = np.uint64(1000003)
    h = np.zeros(len(data) - k + 1 if len(data) >= k else 0, dtype=np.uint64)
    if len(h):
        acc = np.zeros(len(h), dtype=np.uint64)
        for j in range(k):
            acc = acc * base + data[j : j + len(h)].astype(np.uint64)
        h = acc
    out = []
    for i in range(n):
        s, e = offs[i], offs[i + 1]
        if e - s < k:
            out.append(np.zeros(0, np.uint64))
        else:
            out.append(h[s : e - k + 1])
    return out


class MinHashLSH:
    """Actor-pool stage: doc text -> (band_id, band_hash, doc_id) rows.

    num_perm minhashes via the standard (a*x+b) mod p universal family;
    permutation parameters generated once per actor in __init__ (seed-fixed).
    Bands of r rows each; near-duplicates collide in >=1 band and are grouped
    by a downstream groupby(["band_id", "band_hash"]).
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 5, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.full(self.num_perm, np.uint64(0xFFFFFFFFFFFFFFFF))
        # (P, S) universal hashes -> min over shingles
        hashed = (shingles[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return hashed.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        shingle_lists = _shingle_hashes(batch["text"], self.k)
        n = len(ids)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        for i, sh in enumerate(shingle_lists):
            sigs[i] = self.signature(sh)
        r = self.rows_per_band
        band_hash = np.empty((n, self.bands), dtype=np.uint64)
        for b in range(self.bands):
            chunk = sigs[:, b * r : (b + 1) * r]
            acc = np.full(n, np.uint64(0xCBF29CE484222325))
            prime = np.uint64(0x100000001B3)
            for j in range(r):
                acc = (acc ^ chunk[:, j]) * prime
            band_hash[:, b] = acc
        return pa.table(
            {
                "band_id": np.repeat(np.arange(self.bands, dtype=np.int32), n),
                "band_hash": band_hash.T.ravel(),
                "doc_id": np.tile(ids, self.bands),
            }
        )


def minhash_candidate_pairs(ds, num_perm=64, bands=16, shingle_k=5, concurrency=None):
    """Near-dup candidate pairs via LSH banding: actor-pool signature stage ->
    groupby(band) -> per-bucket pair emission (buckets are tiny) -> distinct.

    Output: id1 < id2 candidate pairs (verify Jaccard downstream)."""
    from ..util import default_pool_size

    banded = ds.map_batches(
        MinHashLSH,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "shingle_k": shingle_k},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
        concurrency=concurrency if concurrency is not None else default_pool_size(),
    )

    def pairs(g):
        import pandas as pd

        ids = np.sort(g["doc_id"].to_numpy())
        if len(ids) < 2 or len(ids) > 1000:  # skip degenerate giant buckets
            return pd.DataFrame({"id1": [], "id2": []})
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id1": ids[ii], "id2": ids[jj]})

    cand = banded.groupby(["band_id", "band_hash"]).map_groups(pairs, batch_format="pandas")

    def dedup_batch(b: pa.Table) -> pa.Table:
        return b.group_by(["id1", "id2"], use_threads=False).aggregate([])

    from ray.data.aggregate import Count

    return (
        cand.map_batches(dedup_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None,)
        .groupby(["id1", "id2"])
        .aggregate(Count(alias_name="n_bands"))
    )


def jaccard_verify(pairs_df, texts_by_id: dict, shingle_k: int = 5, threshold: float = 0.7):
    """Driver-side verification for small candidate sets (tests); the scaled
    path re-joins text via broadcast and verifies inside map_batches."""
    import pandas as pd

    def shingles(t: str):
        return {t[i : i + shingle_k] for i in range(max(0, len(t) - shingle_k + 1))}

    rows = []
    for id1, id2 in zip(pairs_df["id1"], pairs_df["id2"]):
        s1, s2 = shingles(texts_by_id[id1]), shingles(texts_by_id[id2])
        j = len(s1 & s2) / max(1, len(s1 | s2))
        if j >= threshold:
            rows.append((id1, id2, j))
    return pd.DataFrame(rows, columns=["id1", "id2", "jaccard"])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHash:
    """64-bit SimHash over byte 4-gram hashes; near-dups differ in few bits.
    Stateless math but kept as a class for parity with the actor pattern."""

    def __init__(self, shingle_k: int = 4):
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        shingle_lists = _shingle_hashes(batch["text"], self.k)
        n = len(batch)
        out = np.zeros(n, dtype=np.uint64)
        for i, sh in enumerate(shingle_lists):
            if len(sh) == 0:
                continue
            bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            votes = (2 * bits - 1).sum(axis=0)
            out[i] = np.packbits((votes > 0)[::-1]).view(">u8")[0]
        return batch.append_column("simhash", pa.array(out, pa.uint64()))


def simhash_candidate_pairs(ds, max_hamming: int = 8, bands: int = 4):
    """SimHash near-dup: 64-bit signatures banded into ``bands`` 16-bit
    chunks; docs sharing any chunk are candidates (guaranteed to catch all
    pairs with < bands bit flips), verified by exact hamming distance.
    Output: id1 < id2, hamming."""
    signed = ds.map_batches(SimHash(), batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def band_rows(batch: pa.Table) -> pa.Table:
        sh = batch["simhash"].to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        width = 64 // bands
        out_band, out_key, out_id, out_sh = [], [], [], []
        for b in range(bands):
            chunk = (sh >> np.uint64(b * width)) & np.uint64((1 << width) - 1)
            out_band.append(np.full(n, b, dtype=np.int32))
            out_key.append(chunk)
            out_id.append(ids)
            out_sh.append(sh)
        return pa.table(
            {
                "band_id": np.concatenate(out_band),
                "band_key": np.concatenate(out_key),
                "doc_id": np.concatenate(out_id),
                "simhash": np.concatenate(out_sh),
            }
        )

    banded = signed.map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def pairs(g):
        import pandas as pd

        order = np.argsort(g["doc_id"].to_numpy())
        ids = g["doc_id"].to_numpy()[order]
        sh = g["simhash"].to_numpy()[order].astype(np.uint64)
        if len(ids) < 2 or len(ids) > 1000:
            return pd.DataFrame({"id1": pd.Series([], dtype=np.int64),
                                 "id2": pd.Series([], dtype=np.int64),
                                 "hamming": pd.Series([], dtype=np.int64)})
        ii, jj = np.triu_indices(len(ids), k=1)
        hd = hamming_distance(sh[ii], sh[jj])
        keep = (hd <= max_hamming) & (ids[ii] != ids[jj])
        return pd.DataFrame({"id1": ids[ii][keep].astype(np.int64),
                             "id2": ids[jj][keep].astype(np.int64),
                             "hamming": hd[keep].astype(np.int64)})

    cand = banded.groupby(["band_id", "band_key"]).map_groups(pairs, batch_format="pandas")

    def dedup_batch(b: pa.Table) -> pa.Table:
        return b.group_by(["id1", "id2"], use_threads=False).aggregate([("hamming", "min")]).rename_columns(["id1", "id2", "hamming"])

    from ray.data.aggregate import Min

    return (
        cand.map_batches(dedup_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .groupby(["id1", "id2"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )


def ngram_jaccard_pairs(ds, shingle_k: int = 5, threshold: float = 0.5,
                        num_perm: int = 64, bands: int = 16):
    """n-gram Jaccard near-dup: MinHash-LSH candidates -> exact Jaccard
    verify inside the join stage (texts re-read via broadcast dict built from
    the candidates' ids — at corpus scale this is a bucketed join instead).
    Output: id1 < id2, jaccard >= threshold (exact, float64)."""
    import ray

    cand = minhash_candidate_pairs(ds, num_perm=num_perm, bands=bands, shingle_k=shingle_k)
    texts_ref = ray.put(
        {r["doc_id"]: r["text"] for r in ds.select_columns(["doc_id", "text"]).take_all()}
    )

    def verify(b: pa.Table) -> pa.Table:
        import ray as _ray

        texts = _ray.get(texts_ref)
        id1 = b["id1"].to_numpy(zero_copy_only=False)
        id2 = b["id2"].to_numpy(zero_copy_only=False)
        jac = np.empty(len(id1))
        for i, (a, c) in enumerate(zip(id1, id2)):
            ta, tc = texts[int(a)], texts[int(c)]
            sa = {ta[j : j + shingle_k] for j in range(max(0, len(ta) - shingle_k + 1))}
            sc = {tc[j : j + shingle_k] for j in range(max(0, len(tc) - shingle_k + 1))}
            jac[i] = len(sa & sc) / max(1, len(sa | sc))
        t = pa.table({"id1": id1, "id2": id2, "jaccard": jac})
        return t.filter(pa.array(jac >= threshold))

    return cand.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def embedding_neardup_pairs(ds, threshold: float = 0.95, id_col: str = "vec_id", n_planes: int = 8):
    """Embedding-cosine near-dup: hyperplane-LSH buckets -> within-bucket
    exact cosine (float64) -> pairs above threshold.  Output: id1 < id2,
    cosine."""
    from .ann import HyperplaneLSH, _embedding_matrix

    def bucketize(batch: pa.Table) -> pa.Table:
        emb = _embedding_matrix(batch["embedding"])
        lsh = HyperplaneLSH(emb.shape[1], n_planes=n_planes)
        return batch.append_column("bucket", pa.array(lsh.bucket(emb)))

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    def pairs(g):
        import pandas as pd

        ids = g[id_col].to_numpy()
        emb = np.stack(g["embedding"].to_numpy())
        order = np.argsort(ids)
        ids, emb = ids[order], emb[order].astype(np.float64)
        if len(ids) < 2 or len(ids) > 2000:
            return pd.DataFrame({"id1": pd.Series([], dtype=np.int64),
                                 "id2": pd.Series([], dtype=np.int64),
                                 "cosine": pd.Series([], dtype=np.float64)})
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (emb / norms) @ (emb / norms).T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = sims[ii, jj] >= threshold
        return pd.DataFrame({"id1": ids[ii][keep].astype(np.int64),
                             "id2": ids[jj][keep].astype(np.int64),
                             "cosine": sims[ii, jj][keep]})

    return bucketed.groupby("bucket").map_groups(pairs, batch_format="pandas")


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt
