"""Co-located bucketed join: shuffle-free plan + parity with plain join."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_shuffle_free(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.colocated import (
        bucketed_customer_orders,
        ensure_bucketed_tables,
    )

    # pin the sort-merge path so the test exercises bucketing rather than
    # a broadcast plan (restore after)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ensure_bucketed_tables(spark, sf_smoke)
        plan = _plan(bucketed_customer_orders(spark, sf_smoke))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    # join AND per-key aggregation inherit the bucketed partitioning:
    # no hash-partitioning exchange anywhere before the final top-k
    assert "Exchange hashpartitioning" not in plan, plan


def test_bucketed_join_matches_plain_join(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.colocated import (
        TOP_CUSTOMERS,
        bucketed_customer_orders,
    )
    from bigdata_infra_cs489_spark.sources.tables import load

    got = sorted(map(tuple, bucketed_customer_orders(spark, sf_smoke).collect()))
    cust = load(spark, sf_smoke, "customer")
    orders = load(spark, sf_smoke, "orders")
    want = sorted(
        map(
            tuple,
            (
                cust.join(orders, cust.c_custkey == orders.o_custkey)
                .groupBy("c_custkey", "c_name")
                .agg(
                    F.count(F.lit(1)).alias("n_orders"),
                    F.round(F.sum("o_totalprice"), 2).alias("total_price"),
                )
                .orderBy(F.desc("total_price"), F.asc("c_custkey"))
                .limit(TOP_CUSTOMERS)
                .collect()
            ),
        )
    )
    assert got == want
