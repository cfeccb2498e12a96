"""Extended relational vocabulary: anti-join, rollup, percentiles,
distinct aggregates, lead/lag."""

from __future__ import annotations

import pytest

from .oracle import assert_matches_oracle

NAMES = [
    "customers_without_orders",
    "events_rollup_counts",
    "events_cube_counts",
    "events_value_percentiles",
    "events_distinct_users",
    "user_event_gaps",
    "user_type_pivot",
    "order_quartiles",
]


@pytest.mark.parametrize("name", NAMES)
def test_matches_oracle(spark, sf_correct, name):
    import __spark_entry__ as entrymod

    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    assert_matches_oracle(q(spark, sf_correct), sql, sf_correct)


def test_approx_distinct_within_rsd(spark, sf_correct):
    """The HLL scale path stays within ~3x the configured relative error
    of the exact distinct counts."""
    from bigdata_infra_cs489_spark.operators.relational_ext import (
        approx_distinct_users,
        events_distinct_users,
    )

    exact = {r["event_type"]: r["n_users"] for r in events_distinct_users(spark, sf_correct).collect()}
    approx = {
        r["event_type"]: r["n_users_approx"]
        for r in approx_distinct_users(spark, sf_correct, rsd=0.02).collect()
    }
    assert set(exact) == set(approx)
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(2, 0.06 * exact[k])


def test_exact_global_median_matches_oracle_and_local(spark, sf_smoke):
    import statistics

    import __spark_entry__ as entrymod

    from .oracle import assert_matches_oracle

    name = "events_exact_median_global"
    assert_matches_oracle(
        entrymod.queries()[name](spark, sf_smoke),
        entrymod.oracle_sql()[name],
        sf_smoke,
    )

    from bigdata_infra_cs489_spark.operators.relational_ext import (
        events_exact_median_global,
    )
    from bigdata_infra_cs489_spark.sources.tables import load

    [r] = events_exact_median_global(spark, sf_smoke).collect()
    vals = [x.value for x in load(spark, sf_smoke, "events").select("value").collect()]
    assert r.n_rows == len(vals)
    assert abs(r.median_value - round(statistics.median(vals), 4)) < 1e-9


def test_throttle_and_rolling_anomalies_match_oracle(spark, sf_smoke):
    import __spark_entry__ as entrymod

    from .oracle import assert_matches_oracle

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in ("events_throttled", "user_rolling_anomalies"):
        assert_matches_oracle(qs[name](spark, sf_smoke), oracles[name], sf_smoke)


def test_throttle_first_event_always_kept(spark, sf_smoke):
    from collections import defaultdict

    from bigdata_infra_cs489_spark.operators.relational_ext import (
        events_throttled,
    )
    from bigdata_infra_cs489_spark.sources.tables import load

    rows = events_throttled(spark, sf_smoke).collect()
    assert len(rows) == load(spark, sf_smoke, "events").count()
    kept = defaultdict(int)
    for r in rows:
        kept[(r.user_id, r.event_type)] += r.kept
    assert all(v >= 1 for v in kept.values()), (
        "each (user, type) keeps at least its first event"
    )


def test_debounce_matches_oracle_and_dominates_throttle(spark, sf_smoke):
    import __spark_entry__ as entrymod

    from .oracle import assert_matches_oracle

    name = "events_debounced"
    assert_matches_oracle(
        entrymod.queries()[name](spark, sf_smoke),
        entrymod.oracle_sql()[name],
        sf_smoke,
    )

    # every event the raw-gap throttle keeps, true debounce also keeps
    # (last-kept ts <= last-raw ts, so the debounce gap is never smaller)
    from bigdata_infra_cs489_spark.operators.relational_ext import (
        events_debounced,
        events_throttled,
    )

    deb = {r.event_id: r.kept for r in events_debounced(spark, sf_smoke).collect()}
    thr = {r.event_id: r.kept for r in events_throttled(spark, sf_smoke).collect()}
    assert set(deb) == set(thr)
    assert all(deb[e] >= thr[e] for e in deb)
    assert sum(deb.values()) >= sum(thr.values())
