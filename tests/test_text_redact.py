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
