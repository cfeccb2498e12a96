"""media_content_dedup (container-invariant payload dedup) vs an inline
DuckDB oracle built from the decoration's first principles, plus a
crafted re-wrapped-copy corpus (staged for round-9 registration per the
window contract)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.multimodal import (
    attach_media,
    media_content_dedup,
)

from .oracle import assert_matches_oracle

def test_matches_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    assert_matches_oracle(
        media_content_dedup(spark, sf_correct),
        entrymod.oracle_sql()["media_content_dedup"],
        sf_correct,
    )


def test_rewrapped_copies_collapse(spark, sf_smoke):
    """Two docs with the SAME text but different doc_id-derived headers
    (different dims / sample rates / container) must share a content_id
    iff their repeat counts agree — the container metadata never
    contributes to identity. Craft ids 12 and 24: both %4==0 (same
    payload) but 12%3=0 (PNG) vs 24%3=0 ... use 12 (image) and 16
    (audio): 12%4==0, 16%4==0 -> same payload, different container."""
    docs = spark.createDataFrame(
        [(12, "same words here"), (16, "same words here"), (13, "other")],
        "doc_id bigint, text string",
    )
    m = attach_media(docs)
    # route through the same extraction path via a temp view shim: call
    # the payload logic by reusing media_content_dedup's plan on a
    # fixture dir is not possible here, so assert on attach_media level:
    # headers differ, payloads agree
    rows = {r["doc_id"]: bytes(r["media"]) for r in m.collect()}
    b12, b16 = rows[12], rows[16]
    assert b12[:8] != b16[:8], "containers must differ (PNG vs WAV)"
    assert b12[-16:] == b16[-16:], "payload tails must agree"
    # and the payload lengths agree (same repeat count)
    assert len(b12) - 33 == len(b16) - 44
