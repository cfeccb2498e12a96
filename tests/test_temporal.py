"""Temporal joins: window-based as-of join, binned interval join, and the
sketch-invariant query — oracle-checked at sf0.01 plus structural checks
that the scale strategies actually hold."""

from __future__ import annotations

import pytest

from .oracle import assert_matches_oracle

NAMES = [
    "events_asof_last_click",
    "error_click_window_counts",
    "events_sketch_check",
    "user_rolling_value",
]


@pytest.mark.parametrize("name", NAMES)
def test_matches_oracle(spark, sf_correct, name):
    import __spark_entry__ as entrymod

    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    assert_matches_oracle(q(spark, sf_correct), sql, sf_correct)


def test_asof_has_no_join(spark, sf_correct):
    """The as-of implementation must stay a single window pass — any Join
    node in the plan means the quadratic formulation snuck back in."""
    from bigdata_infra_cs489_spark.operators.temporal import asof_last_event

    plan = asof_last_event(spark, sf_correct)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Window" in plan


def test_asof_strictness(spark, sf_smoke):
    """A click at exactly the view's timestamp must NOT count (strict <)."""
    from pyspark.sql import Row

    from bigdata_infra_cs489_spark.operators import temporal as TJ
    from bigdata_infra_cs489_spark.sources import tables

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        Row(event_id=1, user_id=7, event_type="click", ts=t0),
        Row(event_id=2, user_id=7, event_type="view", ts=t0),  # same instant
        Row(
            event_id=3,
            user_id=7,
            event_type="view",
            ts=t0 + dt.timedelta(microseconds=1),
        ),
    ]
    df = spark.createDataFrame(rows)
    orig = tables.load
    try:
        tables_load_patch = lambda spark_, sf_, name: df
        TJ.load = tables_load_patch
        out = {
            r["event_id"]: (r["prior_click_cnt"], r["last_click_ts"])
            for r in TJ.asof_last_event(spark, sf_smoke).collect()
        }
    finally:
        TJ.load = orig
    assert out[2] == (0, None)  # simultaneous click excluded
    assert out[3][0] == 1  # 1 microsecond later: included


def test_interval_join_bucket_fanout(spark, sf_correct):
    """Each interval must explode into at most 2 buckets (window == bucket
    width), keeping candidate generation linear in bucket co-occupancy."""
    from pyspark.sql import functions as F

    from bigdata_infra_cs489_spark.operators.temporal import (
        ERR_WINDOW_SEC,
        _BUCKET_US,
    )
    from bigdata_infra_cs489_spark.sources.tables import load

    ev = load(spark, sf_correct, "events").where(F.col("event_type") == "error")
    us = F.unix_micros("ts")
    n_buckets = (
        F.floor((us + ERR_WINDOW_SEC * 1_000_000 - 1) / _BUCKET_US)
        - F.floor(us / _BUCKET_US)
        + 1
    )
    mx = ev.agg(F.max(n_buckets).alias("m")).collect()[0]["m"]
    assert mx <= 2
