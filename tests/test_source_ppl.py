"""source_perplexity_report (per-source LM-quality ranking card) vs an
inline DuckDB oracle composed from the registered CCNet bucket SQL,
plus consistency invariants against the bucket assignment (staged for
round-10 registration per the window contract)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.ccnet import (
    ccnet_perplexity_buckets,
    source_perplexity_report,
)

from .oracle import assert_matches_oracle


def _report_sql() -> str:
    from bigdata_infra_cs489_spark.plans.catalog import _CCNET_BUCKETS_SQL

    return f"""
    WITH b AS ({_CCNET_BUCKETS_SQL}),
    j AS (SELECT b.doc_id, b.avg_nll, b.bucket, d.source
          FROM b JOIN documents d USING (doc_id)),
    agg AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               sum(CAST(floor(avg_nll * 1000000 + 0.5) AS BIGINT))
                   AS sum_micro,
               CAST(coalesce(sum(CASE WHEN bucket = 'head' THEN 1 END), 0)
                    AS BIGINT) AS head_docs,
               CAST(coalesce(sum(CASE WHEN bucket = 'middle' THEN 1 END), 0)
                    AS BIGINT) AS middle_docs,
               CAST(coalesce(sum(CASE WHEN bucket = 'tail' THEN 1 END), 0)
                    AS BIGINT) AS tail_docs
        FROM j GROUP BY source)
    SELECT source, n_docs,
           CAST((sum_micro + n_docs // 2) // n_docs AS BIGINT)
               AS mean_nll_micro,
           head_docs, middle_docs, tail_docs,
           CAST((head_docs * 1000000 + n_docs // 2)
                // greatest(n_docs, 1) AS BIGINT) AS head_ppm
    FROM agg
    """


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        source_perplexity_report(spark, sf_correct), _report_sql(), sf_correct
    )


def test_consistent_with_buckets(spark, sf_smoke):
    """Tercile counts partition each source's scoreable docs; the card
    conserves to the bucket assignment; head_ppm replays exactly; the
    fixture must rank sources non-trivially (not all head_ppm equal)."""
    from bigdata_infra_cs489_spark.sources.tables import load

    buckets = ccnet_perplexity_buckets(spark, sf_smoke).collect()
    src = {
        r["doc_id"]: r["source"]
        for r in load(spark, sf_smoke, "documents").select("doc_id", "source").collect()
    }
    per: dict[str, dict[str, int]] = {}
    for r in buckets:
        d = per.setdefault(src[r["doc_id"]], {"n": 0, "head": 0, "middle": 0, "tail": 0})
        d["n"] += 1
        d[r["bucket"]] += 1
    rows = source_perplexity_report(spark, sf_smoke).collect()
    assert {r["source"] for r in rows} == set(per)
    for r in rows:
        w = per[r["source"]]
        assert r["n_docs"] == w["n"]
        assert (r["head_docs"], r["middle_docs"], r["tail_docs"]) == (
            w["head"], w["middle"], w["tail"],
        )
        assert r["head_docs"] + r["middle_docs"] + r["tail_docs"] == r["n_docs"]
        assert r["head_ppm"] == (r["head_docs"] * 1_000_000 + r["n_docs"] // 2) // r["n_docs"]
    assert len({r["head_ppm"] for r in rows}) > 1
