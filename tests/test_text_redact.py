"""Regex redaction stage: counts, replacement, and empty/edge batches."""

import pyarrow as pa

from geotrellis_contrib_ray.stages.text import redact_regex


def test_redact_counts_and_replaces(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "customer key hash",
                    "no match here",
                    "",  # empty string row (null-buffer gotcha)
                    "keying is not a key match for hashes but key is",
                ],
                pa.string(),
            ),
        }
    )
    out = (
        redact_regex(rd.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_hits"].tolist() == [3, 0, 0, 2]
    assert out["redacted"][0] == "[REDACTED] [REDACTED] [REDACTED]"
    assert out["redacted"][1] == "no match here"
    assert out["redacted"][2] == ""
    # \b word boundary: 'keying'/'hashes' untouched, bare 'key' twice
    assert (
        out["redacted"][3]
        == "keying is not a [REDACTED] match for hashes but [REDACTED] is"
    )
    assert out["n_hits"].dtype == "int64"


def test_repetition_stats_planted(ray_session):
    """A looped text has far more duplicate 5-grams than a varied one."""
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_contrib_ray.stages.text import repetition_stats

    looped = "spam " * 40                      # 200 chars of repetition
    varied = "".join(chr(97 + (i * 7) % 26) + str(i) for i in range(60))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([looped, varied]),
    }))
    df = repetition_stats(ds, k=5).to_pandas().set_index("doc_id")
    for doc_id, text in ((1, looped), (2, varied)):
        grams = [text[i:i + 5] for i in range(len(text) - 4)]
        assert df.loc[doc_id, "n_grams"] == len(grams)
        assert df.loc[doc_id, "n_distinct"] == len(set(grams))
    assert df.loc[1, "n_distinct"] == 5        # rotations of "spam "
    assert df.loc[1, "n_dup"] > df.loc[2, "n_dup"]
    assert (df["n_grams"] == df["n_distinct"] + df["n_dup"]).all()
