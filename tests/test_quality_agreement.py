"""quality_signal_agreement (CCNet tercile × heuristic gate × Gopher
gate cross-tab) vs an inline DuckDB oracle composed from the registered
fragments, plus conservation/consistency invariants (staged for
round-10 registration per the window contract)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.docquality import (
    quality_signal_agreement,
)

from .oracle import assert_matches_oracle


def _agreement_sql() -> str:
    from bigdata_infra_cs489_spark.operators.curate import (
        CURATE_GOPHER_RULES,
        CURATE_MIN_QUALITY,
    )
    from bigdata_infra_cs489_spark.plans.catalog import (
        _CCNET_BUCKETS_SQL,
        _TEXT_QUALITY_SQL,
        DUCK_GOPHER_FLAGS,
    )

    gate = " AND ".join(CURATE_GOPHER_RULES)
    return f"""
    WITH b AS ({_CCNET_BUCKETS_SQL}),
    tq AS ({_TEXT_QUALITY_SQL}),
    gof AS (SELECT doc_id, ({gate}) AS gopher_pass
            FROM ({DUCK_GOPHER_FLAGS})),
    j AS (SELECT b.bucket,
                 tq.quality_score >= {CURATE_MIN_QUALITY} AS quality_ok,
                 gof.gopher_pass AS gopher_ok
          FROM b JOIN tq USING (doc_id) JOIN gof USING (doc_id)),
    cells AS (SELECT bucket, quality_ok, gopher_ok,
                     CAST(count(*) AS BIGINT) AS n_docs
              FROM j GROUP BY 1, 2, 3),
    tot AS (SELECT bucket, CAST(count(*) AS BIGINT) AS row_total
            FROM j GROUP BY 1)
    SELECT c.bucket, c.quality_ok, c.gopher_ok, c.n_docs,
           CAST((c.n_docs * 1000000 + t.row_total // 2)
                // greatest(t.row_total, 1) AS BIGINT) AS bucket_ppm
    FROM cells c JOIN tot t USING (bucket)
    """


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        quality_signal_agreement(spark, sf_correct), _agreement_sql(), sf_correct
    )


def test_conserves_and_has_signal(spark, sf_correct):
    """Cell counts conserve to the scoreable-doc domain; per-bucket ppm
    shares sum to ~1e6; every tercile appears; the fixture must show
    BOTH agreeing and disagreeing cells (an all-agree matrix would make
    the card vacuous)."""
    from bigdata_infra_cs489_spark.operators.ccnet import (
        ccnet_perplexity_buckets,
    )

    rows = quality_signal_agreement(spark, sf_correct).collect()
    n_scoreable = ccnet_perplexity_buckets(spark, sf_correct).count()
    assert sum(r["n_docs"] for r in rows) == n_scoreable
    assert {r["bucket"] for r in rows} == {"head", "middle", "tail"}
    by_bucket: dict[str, list] = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for bucket, rs in by_bucket.items():
        assert abs(sum(r["bucket_ppm"] for r in rs) - 1_000_000) <= len(rs), bucket
    agree = [r for r in rows if r["quality_ok"] == r["gopher_ok"]]
    disagree = [r for r in rows if r["quality_ok"] != r["gopher_ok"]]
    assert agree and disagree
