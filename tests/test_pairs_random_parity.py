"""Randomized adversarial parity for the PAIRS / SAMPLING document families
(the dedup self-joins, chunk machinery, and hash-deterministic samplers the
original documents-family suite does not cover): planted exact/near/shared-
chunk/shared-substring duplicates, NULL and empty texts, unicode, whitespace
runs — replayed through the REAL queries()/oracle_sql() surface on a tmp
documents.parquet (every one of these queries reads only that table, and
footer-dependent operators see a real parquet footer)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# unicode-safe: token-level hashes (hash equality == string equality),
# whole-text equality winners, id-hash samplers, per-lang rollups
QUERIES_UNICODE = [
    "paragraph_dedup", "paragraph_dup_ratio",
    "dedup_delta", "corpus_clean", "vocab_coverage", "stratified_sample",
    "train_split", "shuffle_head", "top_docs_per_lang", "lang_profile",
    "chunk_docs", "mixture_sample", "dedup_keep_best",
    "dedup_clusters", "dedup_apply",
]
# byte-domain sketches (COVERAGE.md shingle-domain scoping): shingles are
# UTF-8 bytes and the ascii(substr(...)) SQL replays are exact on ASCII —
# the twins' documented domain — so these run on the ASCII-projected
# corpus (same duplicate/empty/NULL/whitespace adversarial shapes)
QUERIES_ASCII = [
    "jaccard_exact_pairs", "jaccard_prefix_pairs", "substring_pairs",
    "contamination", "minhash_pairs",
]

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "theta",
         "lambda", "sigma", "omega", "doklad", "data", "merge", "scan"]

# a paragraph long enough to own full 10-token chunks, shared verbatim
_PARA = ("shared chunk body one two three four five six seven eight nine "
         "ten eleven twelve thirteen fourteen fifteen sixteen seventeen "
         "eighteen nineteen twenty")
# >= SUBSTR_WIN (32) chars so aligned substring windows collide
_RUN = "0123456789abcdefghijklmnopqrstuvwxyz0123456789"
_CANON = "the canonical duplicate body with several words in fixed order"


def _random_documents(seed: int, n: int = 500,
                      ascii_only: bool = False) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        kind = rng.random()
        if kind < 0.04:
            texts.append("")
        elif kind < 0.07:
            texts.append(None)  # NULL text: every twin must drop/keep alike
        elif kind < 0.18:
            texts.append(_CANON)  # exact duplicates
        elif kind < 0.26:
            # near-duplicate: canon with one word substituted
            w = _CANON.split(" ")
            w[int(rng.integers(0, len(w)))] = str(rng.choice(WORDS))
            texts.append(" ".join(w))
        elif kind < 0.34:
            # shared leading paragraph + random tail (chunk-dedup hits)
            texts.append(_PARA + " " + " ".join(
                rng.choice(WORDS, int(rng.integers(2, 12)))))
        elif kind < 0.40:
            # shared 46-char run embedded in random context (substring hits)
            texts.append(" ".join(rng.choice(WORDS, 3)) + " " + _RUN +
                         " " + " ".join(rng.choice(WORDS, 3)))
        elif kind < 0.46:
            texts.append(("ascii stand in run " if ascii_only
                          else "unicode žluťoučký 情報 🚀 ")
                         + str(rng.choice(WORDS)))
        elif kind < 0.52:
            texts.append("  lead " + "\t".join(rng.choice(WORDS, 3)) +
                         "   trail  ")
        else:
            texts.append(" ".join(
                rng.choice(WORDS, int(rng.integers(3, 40)))))
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(rng.choice(["en", "cs", "zh"], n), pa.string()),
        "source": pa.array(rng.choice(["web", "book", "wiki", "news"], n),
                           pa.string()),
        "n_chars": pa.array(np.array(
            [len(t) if t is not None else 0 for t in texts], np.int64)),
    })


@pytest.mark.parametrize("seed,ascii_only", [(7, False), (23, False),
                                             (7, True), (23, True)])
def test_pairs_family_random_parity(ray_session, seed, ascii_only, tmp_path):
    import duckdb

    import __ray_entry__ as e

    t = _random_documents(seed, ascii_only=ascii_only)
    sf = str(tmp_path)
    pq.write_table(t, f"{sf}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    for name in (QUERIES_ASCII if ascii_only else QUERIES_UNICODE):
        r = e.queries()[name](sf)
        got = r.to_pandas() if not isinstance(r, pd.DataFrame) else r
        exp = con.execute(e.oracle_sql()[name]).df()
        cols = sorted(got.columns)
        got = got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        exp = exp[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        assert got.shape == exp.shape, f"{name}: {got.shape} vs {exp.shape}"
        for c in cols:
            gv, ev = got[c].to_numpy(), exp[c].to_numpy()
            if gv.dtype.kind == "O" or ev.dtype.kind == "O":
                assert (gv.astype(object) == ev.astype(object)).all(), f"{name}.{c}"
            elif gv.dtype.kind == "f" or ev.dtype.kind == "f":
                assert np.array_equal(gv.astype(np.float64),
                                      ev.astype(np.float64),
                                      equal_nan=True), f"{name}.{c}"
            else:
                assert (gv.astype(np.int64) == ev.astype(np.int64)).all(), \
                    f"{name}.{c}"
