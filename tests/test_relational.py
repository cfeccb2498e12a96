"""Correctness of the assignment5 relational core vs the DuckDB oracle,
at the driver's sf0.01 scale."""

from __future__ import annotations

import pytest

from .oracle import assert_matches_oracle

RELATIONAL = [
    "q1_count_shipped",
    "q2_orders_semijoin_topk",
    "q3_lineitem_part_supplier",
    "q4_shipments_by_nation",
    "q5_monthly_shipments_two_nations",
    "q6_pricing_summary",
    "q7_top_revenue_orders",
]


@pytest.mark.parametrize("name", RELATIONAL)
def test_matches_oracle(spark, sf_correct, name):
    import __spark_entry__ as entrymod

    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    assert_matches_oracle(q(spark, sf_correct), sql, sf_correct)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_have_oracles_or_are_flagged(spark):
    """Every queries() key should either have an oracle or be a documented
    non-SQL-expressible op (name prefixed accordingly)."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
