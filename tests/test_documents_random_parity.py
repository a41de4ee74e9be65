"""Randomized adversarial parity for the documents-family queries: empty
strings, exact duplicates, whitespace runs, unicode/emoji, repeated
substrings — layouts the generator-made testdata never produces, run
through the REAL queries()/oracle_sql() surface on a tmp documents.parquet."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

QUERIES = [
    "dedup_exact", "mode_chars", "cube_lang_source", "rollup_lang_source",
    "jsonl_roundtrip", "csv_roundtrip", "quantile_chars",
    "quantile_chars_cont", "distinct_lang_source", "normalize_text",
    "top_chars", "token_stats", "quality_counts", "quality_scores",
    "repetition", "tfidf_terms", "edit_distance_pairs", "top_bigrams",
    "pivot_lang_source", "lang_set_ops", "bow_dedup", "regex_tokens",
    "zscore_chars", "top_bigrams_hh",
]

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
         "komunikace", "informace", "doklad", "data"]


def _random_documents(seed: int, n: int = 600) -> pa.Table:
    rng = np.random.default_rng(seed)
    canon = "the canonical duplicate body with several words"
    texts = []
    for i in range(n):
        kind = rng.random()
        if kind < 0.03:
            texts.append(None)  # NULL text: twins must agree on NULL-vs-''
        elif kind < 0.05:
            texts.append("")
        elif kind < 0.15:
            texts.append(canon)  # exact duplicates stress dedup winners
        elif kind < 0.25:
            texts.append("  lead " + "\t".join(
                rng.choice(WORDS, 3)) + "   trail  ")
        elif kind < 0.32:
            w = str(rng.choice(WORDS))
            texts.append((w + " ") * int(rng.integers(8, 25)))  # repetition
        elif kind < 0.4:
            texts.append("unicode žluťoučký 情報 🚀 " + str(rng.choice(WORDS)))
        else:
            texts.append(" ".join(rng.choice(WORDS, int(rng.integers(3, 30)))))
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(rng.choice(["en", "cs", "zh"], n), pa.string()),
        "source": pa.array(rng.choice(["web", "book", "wiki", "news"], n),
                           pa.string()),
        "n_chars": pa.array(np.array([len(t) if t is not None else 0 for t in texts], np.int64)),
    })


@pytest.mark.parametrize("seed", [5, 17])
def test_documents_family_random_parity(ray_session, seed, tmp_path):
    import duckdb

    import __ray_entry__ as e

    t = _random_documents(seed)
    sf = str(tmp_path)
    pq.write_table(t, f"{sf}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    for name in QUERIES:
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
                gn, en = pd.isna(gv), pd.isna(ev)
                assert (gn == en).all() and (
                    gv[~gn].astype(object) == ev[~en].astype(object)).all(), \
                    f"{name}.{c}"
            elif gv.dtype.kind == "f" or ev.dtype.kind == "f":
                assert np.array_equal(gv.astype(np.float64),
                                      ev.astype(np.float64),
                                      equal_nan=True), f"{name}.{c}"
            else:
                assert (gv.astype(np.int64) == ev.astype(np.int64)).all(), \
                    f"{name}.{c}"
