"""jaccard_threshold_curve (verify-threshold sensitivity card over the
banded LSH candidate set) vs an inline DuckDB oracle composed from the
registered pair CTEs, plus consistency with minhash_near_duplicates
(oracle single-sourced in plans/catalog.py since round-10 registration)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    jaccard_threshold_curve,
)

from .oracle import assert_matches_oracle


def _curve_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["jaccard_threshold_curve"]


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        jaccard_threshold_curve(spark, sf_correct), _curve_sql(), sf_correct
    )


def test_consistent_with_registered_threshold(spark, sf_correct):
    """The cumulative column at the registered threshold's centile
    equals minhash_near_duplicates' pair count when the threshold sits
    exactly on a centile boundary (it does: 0.8); cumulative is
    monotone non-increasing in the centile; the fixture must populate
    more than one centile."""
    from bigdata_infra_cs489_spark.operators.dedup import (
        _docs,
        minhash_near_duplicates,
    )

    rows = sorted(
        jaccard_threshold_curve(spark, sf_correct).collect(),
        key=lambda r: r["jaccard_pct"],
    )
    assert len(rows) > 1
    cums = [r["cum_pairs_at_or_above"] for r in rows]
    assert cums == sorted(cums, reverse=True)
    assert all(
        r["cum_pairs_at_or_above"] == sum(x["n_pairs"] for x in rows[i:])
        for i, r in enumerate(rows)
    )
    t_pct = round(JACCARD_THRESHOLD * 100)
    n_at_threshold = sum(
        r["n_pairs"] for r in rows if r["jaccard_pct"] >= t_pct
    )
    n_registered = minhash_near_duplicates(_docs(spark, sf_correct)).count()
    assert n_at_threshold == n_registered
