"""contamination_spans (position-level benchmark-overlap marking) vs an
inline DuckDB oracle composed from the shared span fragments, plus
cross-operator consistency with the document-level contamination flags
(single-sourced in plans/catalog.py since round-9 registration)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.dedup import CONTAM_EVAL_MAX_ID
from bigdata_infra_cs489_spark.operators.spans import (
    SPAN_K,
    contamination_spans,
)

from .oracle import assert_matches_oracle


def _spans_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["contamination_spans"]


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        contamination_spans(spark, sf_correct), _spans_sql(), sf_correct
    )


def test_fixture_has_signal(spark, sf_correct):
    """At least one train doc must carry a contaminated span, or the
    oracle only ever exercises the all-zeros path."""
    rows = contamination_spans(spark, sf_correct).collect()
    assert all(r["doc_id"] >= CONTAM_EVAL_MAX_ID for r in rows)
    marked = [r for r in rows if r["n_spans"] > 0]
    assert marked
    for r in marked:
        assert SPAN_K <= r["contam_tokens"] <= r["n_tokens"]
        assert 0 < r["contam_ppm"] <= 1_000_000


def test_consistent_with_document_flags(spark, sf_smoke):
    """A train doc with a marked span shares a SPAN_K-gram with the eval
    set; since SPAN_K >= the shingle width the exact document flags use,
    its contamination_flags row must show n_hits > 0. Zero-span docs
    report the exact zero tuple."""
    from bigdata_infra_cs489_spark.operators.dedup import (
        SHINGLE_N,
        q_contamination_flags,
    )

    assert SPAN_K >= SHINGLE_N
    spans = {r["doc_id"]: r for r in contamination_spans(spark, sf_smoke).collect()}
    flags = {
        r["doc_id"]: r["n_hits"]
        for r in q_contamination_flags(spark, sf_smoke).collect()
    }
    assert set(spans) == set(flags)
    for d, r in spans.items():
        if r["n_spans"] > 0:
            assert flags[d] > 0, d
        else:
            assert (r["contam_tokens"], r["contam_ppm"]) == (0, 0), d
