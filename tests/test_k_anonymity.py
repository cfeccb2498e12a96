"""k-anonymity audit vs the registered DuckDB oracle (single-sourced
in plans/catalog.py since round-8 registration) plus monotonicity and
fixture-signal invariants."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.table_ops import (
    K_ANON_THRESHOLDS,
    k_anonymity_report,
)

from .oracle import assert_matches_oracle

def test_matches_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    assert_matches_oracle(
        k_anonymity_report(spark, sf_correct),
        entrymod.oracle_sql()["k_anonymity_report"],
        sf_correct,
    )


def test_monotone_and_has_signal(spark, sf_correct):
    """Risk counts are monotone non-decreasing in k, n_cohorts is
    k-independent, risk_ppm reconciles, and the fixture must exercise
    BOTH a clean and an at-risk threshold or the oracle only ever sees
    zeros."""
    rows = {r["k"]: r for r in k_anonymity_report(spark, sf_correct).collect()}
    assert sorted(rows) == sorted(K_ANON_THRESHOLDS)
    ks = sorted(rows)
    assert len({rows[k]["n_cohorts"] for k in ks}) == 1
    for a, b in zip(ks, ks[1:]):
        assert rows[a]["n_small_cohorts"] <= rows[b]["n_small_cohorts"]
        assert rows[a]["n_users_at_risk"] <= rows[b]["n_users_at_risk"]
    assert rows[ks[0]]["n_users_at_risk"] == 0, "smallest k should be clean"
    assert rows[ks[-1]]["n_users_at_risk"] > 0, "largest k should flag users"
