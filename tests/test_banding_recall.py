"""lsh_banding_recall (measured candidate recall of the MinHash banding
per true-Jaccard threshold) vs an inline DuckDB oracle composed from
the registered pair CTEs, plus monotonicity/ground-truth invariants
(oracle single-sourced in plans/catalog.py since round-10 registration)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.dedup import (
    LSH_RECALL_THRESHOLDS,
    lsh_banding_recall,
)

from .oracle import assert_matches_oracle


def _recall_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["lsh_banding_recall"]


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        lsh_banding_recall(spark, sf_correct), _recall_sql(), sf_correct
    )


def test_recall_monotone_and_grounded(spark, sf_correct):
    """Recall is monotone non-decreasing in the threshold (higher-J
    pairs are strictly easier for the banding to catch — probability
    1-(1-s^r)^b increases in s); true-pair counts are monotone
    non-increasing; at the registered 0.8+ regime recall must be high
    on the fixture's near-identical pairs; the card must include at
    least one threshold with imperfect recall OR more true pairs than
    candidates can trivially cover (i.e. the measurement is not
    vacuous)."""
    rows = sorted(
        lsh_banding_recall(spark, sf_correct).collect(),
        key=lambda r: r["t_pct"],
    )
    assert [r["t_pct"] for r in rows] == sorted(LSH_RECALL_THRESHOLDS)
    trues = [r["n_true_pairs"] for r in rows]
    recalls = [r["recall_ppm"] for r in rows]
    assert trues == sorted(trues, reverse=True)
    assert recalls == sorted(recalls)
    assert rows[0]["n_true_pairs"] > 0
    by_t = {r["t_pct"]: r for r in rows}
    assert by_t[90]["recall_ppm"] >= 900_000
    assert all(r["n_caught"] <= r["n_true_pairs"] for r in rows)
