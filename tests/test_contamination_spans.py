"""contamination_spans (position-level benchmark-overlap marking) vs an
inline DuckDB oracle composed from the shared span fragments, plus
cross-operator consistency with the document-level contamination flags
(staged for round-9 registration per the window contract)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.dedup import CONTAM_EVAL_MAX_ID
from bigdata_infra_cs489_spark.operators.spans import (
    SPAN_K,
    contamination_spans,
)

from .oracle import assert_matches_oracle


def _spans_sql() -> str:
    from bigdata_infra_cs489_spark.plans.catalog import (
        DUCK_SPAN_GRAM_CTES,
        DUCK_SPAN_MERGE_CTES,
        DUCK_TOKS,
    )

    return f"""
    WITH toks AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents),
    {DUCK_SPAN_GRAM_CTES.lstrip()},
    ev AS (SELECT DISTINCT gram FROM grams
           WHERE doc_id < {CONTAM_EVAL_MAX_ID}),
    hits AS (SELECT g.doc_id, g.n_tokens, g.pos
             FROM grams g JOIN ev USING (gram)
             WHERE g.doc_id >= {CONTAM_EVAL_MAX_ID}),
    {DUCK_SPAN_MERGE_CTES.lstrip()},
    cov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                   CAST(sum(span_len) AS BIGINT) AS contam_tokens
            FROM spans GROUP BY doc_id),
    spine AS (SELECT doc_id,
                     CAST(len({DUCK_TOKS}) AS BIGINT) AS n_tokens
              FROM documents WHERE doc_id >= {CONTAM_EVAL_MAX_ID})
    SELECT s.doc_id, s.n_tokens,
           CAST(coalesce(c.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(coalesce(c.contam_tokens, 0) AS BIGINT) AS contam_tokens,
           CAST((coalesce(c.contam_tokens, 0) * 1000000 + s.n_tokens // 2)
                // greatest(s.n_tokens, 1) AS BIGINT) AS contam_ppm
    FROM spine s LEFT JOIN cov c USING (doc_id)
    """


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
