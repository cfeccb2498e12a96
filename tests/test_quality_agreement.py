"""quality_signal_agreement (CCNet tercile × heuristic gate × Gopher
gate cross-tab) vs an inline DuckDB oracle composed from the registered
fragments, plus conservation/consistency invariants (oracle
single-sourced in plans/catalog.py since round-10 registration)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.docquality import (
    quality_signal_agreement,
)

from .oracle import assert_matches_oracle


def _agreement_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["quality_signal_agreement"]


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
