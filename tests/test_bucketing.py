"""Bucketed tables give shuffle-free joins (plan-level assertion)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_infra_cs489_spark.sources.bucketing import (
    join_is_shuffle_free,
    write_bucketed_table,
)
from bigdata_infra_cs489_spark.sources.tables import load


def test_bucketed_join_has_no_shuffle(spark, sf_smoke):
    li = load(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    od = load(spark, sf_smoke, "orders").select("o_orderkey", "o_orderpriority")
    write_bucketed_table(li, "t_li_bucketed", "l_orderkey", n_buckets=8)
    write_bucketed_table(od, "t_od_bucketed", "o_orderkey", n_buckets=8)

    a = spark.table("t_li_bucketed")
    b = spark.table("t_od_bucketed").hint("merge")  # forbid broadcast: the
    # shuffle-free property must come from bucket co-location, not from a
    # BroadcastExchange that would make this assertion vacuous
    joined = a.join(b, a.l_orderkey == b.o_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # co-located: neither side shuffles
    assert join_is_shuffle_free(joined)

    # and the join is still correct vs the plain parquet join
    want = li.join(od, li.l_orderkey == od.o_orderkey).count()
    assert joined.count() == want


def test_unbucketed_join_does_shuffle(spark, sf_smoke):
    """Control: the same join on raw parquet plans at least one exchange
    once broadcast is disallowed (shows the bucketed plan is the anomaly)."""
    li = load(spark, sf_smoke, "lineitem").select("l_orderkey")
    od = load(spark, sf_smoke, "orders").select("o_orderkey").hint("merge")
    joined = li.join(od, li.l_orderkey == od.o_orderkey)
    assert not join_is_shuffle_free(joined)
