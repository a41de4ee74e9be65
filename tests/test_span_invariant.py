"""North-rule span-sequence invariant enforced as pipeline guard stages."""

import numpy as np
import pyarrow as pa
import pytest

from geotrellis_contrib_ray.sources import documents as docs


def test_guard_passes_through_preserving_stage(ray_session):
    import ray.data as rd

    t = docs.synth_interleaved(200)
    ds = rd.from_arrow(t)
    guarded = ds.map_batches(
        docs.attach_span_signature, batch_format="pyarrow", batch_size=None
    )
    # a preserving stage: shuffle blocks + add a column
    shuffled = guarded.repartition(4).map_batches(
        lambda b: b.append_column("extra", pa.array(np.ones(len(b)))),
        batch_format="pyarrow",
        batch_size=None,
    )
    out = shuffled.map_batches(
        docs.verify_span_signature, batch_format="pyarrow", batch_size=None
    )
    res = out.to_pandas()
    assert len(res) == 200
    assert "_span_sig" not in res.columns


def test_guard_catches_mutation():
    t = docs.synth_interleaved(50)
    stamped = docs.attach_span_signature(t)

    # mutate one row's span order
    rows = stamped.to_pylist()
    rows[7]["spans"] = list(reversed(rows[7]["spans"]))
    schema = stamped.schema
    mutated = pa.Table.from_pylist(rows, schema=schema)
    with pytest.raises(AssertionError, match="span-sequence invariant"):
        docs.verify_span_signature(mutated)


def test_redact_text_spans_preserves_structure():
    """The editing op changes ONLY text-span texts: media refs, offsets,
    kinds, span counts and order are byte-identical before/after."""
    import pyarrow as pa

    from geotrellis_contrib_ray.sources import documents as docs

    t = docs.synth_interleaved(40, seed=3)
    red = docs.redact_text_spans(t, r"\b(alpha|beta)\b", "[X]")
    a, b = t["spans"].combine_chunks(), red["spans"].combine_chunks()
    assert a.offsets.equals(b.offsets)
    va, vb = a.values, b.values
    assert va.field("kind").equals(vb.field("kind"))
    assert va.field("media_ref").equals(vb.field("media_ref"))
    assert va.field("offset").equals(vb.field("offset"))
    # media-span texts untouched; text spans may change
    import pyarrow.compute as pc

    is_media = pc.equal(va.field("kind"), "media")
    assert va.field("text").filter(is_media).equals(vb.field("text").filter(is_media))
