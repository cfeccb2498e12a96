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


def test_nation_market_share_matches_oracle_and_bounds(spark, sf_smoke):
    import __spark_entry__ as entrymod

    from .oracle import assert_matches_oracle

    name = "nation_market_share"
    assert_matches_oracle(
        entrymod.queries()[name](spark, sf_smoke),
        entrymod.oracle_sql()[name],
        sf_smoke,
    )

    from bigdata_infra_cs489_spark.operators.relational import nation_market_share

    rows = nation_market_share(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 0 <= r.mkt_share <= 1
        assert r.nation_revenue <= r.total_revenue


def test_promo_share_matches_oracle_and_bounds(spark, sf_smoke):
    import __spark_entry__ as entrymod

    from .oracle import assert_matches_oracle

    name = "promo_revenue_share"
    assert_matches_oracle(
        entrymod.queries()[name](spark, sf_smoke),
        entrymod.oracle_sql()[name],
        sf_smoke,
    )

    from bigdata_infra_cs489_spark.operators.relational import promo_revenue_share

    rows = promo_revenue_share(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 0 <= r.promo_share_pct <= 100
        assert r.promo_revenue <= r.total_revenue


def test_supplier_and_return_topk_match_oracle(spark, sf_smoke):
    import __spark_entry__ as entrymod

    from .oracle import assert_matches_oracle

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in ("top_suppliers_by_revenue", "top_return_customers"):
        assert_matches_oracle(qs[name](spark, sf_smoke), oracles[name], sf_smoke)
