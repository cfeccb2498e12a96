"""CCNet perplexity terciles vs an inline DuckDB oracle (composed from
the registered bigram-LM fragment) AND a pure-Python replay of the
bucket arithmetic (staged for round-9 registration per the window
contract)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.ccnet import (
    CCNET_BUCKET_NAMES,
    CCNET_N_BUCKETS,
    ccnet_bucket_stats,
    ccnet_perplexity_buckets,
)

from .oracle import assert_matches_oracle


def _buckets_sql() -> str:
    from bigdata_infra_cs489_spark.plans.catalog import DUCK_BIGRAM_LM_CTES

    names = ", ".join(f"'{n}'" for n in CCNET_BUCKET_NAMES)
    return f"""
    WITH {DUCK_BIGRAM_LM_CTES},
    withlang AS (
        SELECT s.doc_id, d.lang, s.n_bigrams, s.avg_nll
        FROM lm_scored s JOIN documents d USING (doc_id)),
    rn AS (
        SELECT *, row_number() OVER (ORDER BY lang, avg_nll, doc_id) AS grn
        FROM withlang),
    pl AS (SELECT lang, min(grn) AS first_rn, count(*) AS n_lang
           FROM rn GROUP BY lang)
    SELECT rn.doc_id, rn.lang, rn.n_bigrams, rn.avg_nll,
           ([{names}])[CAST(((grn - first_rn) * {CCNET_N_BUCKETS})
                            // n_lang AS INT) + 1] AS bucket
    FROM rn JOIN pl USING (lang)
    """


def _stats_sql() -> str:
    return f"""
    WITH b AS ({_buckets_sql()})
    SELECT lang, bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(avg_nll) AS min_nll,
           max(avg_nll) AS max_nll,
           CAST((sum(CAST(floor(avg_nll * 1000000 + 0.5) AS BIGINT))
                 + count(*) // 2) // count(*) AS BIGINT) AS mean_nll_micro
    FROM b GROUP BY lang, bucket
    """


def test_buckets_match_oracle(spark, sf_correct):
    assert_matches_oracle(
        ccnet_perplexity_buckets(spark, sf_correct), _buckets_sql(), sf_correct
    )


def test_stats_match_oracle(spark, sf_correct):
    assert_matches_oracle(
        ccnet_bucket_stats(spark, sf_correct), _stats_sql(), sf_correct
    )


def test_bucket_arithmetic_replay(spark, sf_smoke):
    """Python replay: sort (lang, avg_nll, doc_id); tercile index is
    ((rank_in_lang - 1) * 3) // n_lang; head <= middle <= tail boundary
    monotonicity holds per language; every scoreable doc is bucketed."""
    rows = ccnet_perplexity_buckets(spark, sf_smoke).collect()
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: (r["avg_nll"], r["doc_id"]))
        n = len(rs)
        for i, r in enumerate(rs):
            want = CCNET_BUCKET_NAMES[(i * CCNET_N_BUCKETS) // n]
            assert r["bucket"] == want, (lang, r["doc_id"], i, n)
        # boundary monotonicity: max(head) <= min(middle) etc. on the
        # rounded scores
        for a, b in zip(CCNET_BUCKET_NAMES, CCNET_BUCKET_NAMES[1:]):
            xa = [r["avg_nll"] for r in rs if r["bucket"] == a]
            xb = [r["avg_nll"] for r in rs if r["bucket"] == b]
            if xa and xb:
                assert max(xa) <= min(xb), (lang, a, b)


def test_stats_consistent_with_buckets(spark, sf_smoke):
    b = {
        (r["lang"], r["bucket"]): r
        for r in ccnet_perplexity_buckets(spark, sf_smoke).collect()
    }
    stats = ccnet_bucket_stats(spark, sf_smoke).collect()
    assert sum(r["n_docs"] for r in stats) == len(
        ccnet_perplexity_buckets(spark, sf_smoke).collect()
    )
    for r in stats:
        assert r["min_nll"] <= r["max_nll"]
        assert r["n_docs"] >= 1
    _ = b
