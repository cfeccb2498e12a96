"""Relational vocabulary beyond the reference's inventory.

SURVEY.md §2 notes several operator classes the reference never uses but a
complete engine must offer (§2.3 "no anti-join", §2.4 "no grouping sets /
rollup / distinct-aggregate / approximate aggregates", §2.5 "frame specs,
lead/lag absent"). These close those gaps with Catalyst built-ins, each
oracle-checked against DuckDB:

- anti-join (customers with no orders) — left_anti, the complement of the
  reference's semi-join (P6/J3);
- ROLLUP aggregation over (event_type, month) — grouping-set hierarchy in
  one pass (one shuffle, Expand feeds partial aggregation);
- exact percentiles per group — Spark's ``percentile`` (linear
  interpolation, same definition as DuckDB's quantile_cont);
- distinct-count by group (countDistinct), with the HyperLogLog
  ``approx_count_distinct`` scale path exercised in tests (approximate
  answers can't hash-match an oracle; the test bounds its error vs exact);
- lead/lag frame computation: per-user inter-event gap seconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import month_str
from ..sources.tables import load


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti: customers that never placed an order."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


def events_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (event_type, month): per-(type, month), per-type subtotal,
    and grand total in a single pass."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.rollup("event_type", month_str("ts").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of value per event_type (linear interpolation —
    the same definition DuckDB's quantile_cont uses, so values hash-match)."""
    ev = load(spark, sf_dir, "events")
    pct = F.percentile("value", F.lit([0.5, 0.9, 0.99]))
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.element_at(pct, 1), 6).alias("p50"),
            F.round(F.element_at(pct, 2), 6).alias("p90"),
            F.round(F.element_at(pct, 3), 6).alias("p99"),
        )
    )


def events_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct user count per event_type (two-phase distinct
    aggregate). The approximate HLL twin is approx_distinct_users()."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )


def approx_distinct_users(
    spark: SparkSession, sf_dir: str, rsd: float = 0.02
) -> DataFrame:
    """HyperLogLog++ distinct count — the 100 TB path: one pass, fixed
    sketch memory per group, no exact-distinct shuffle of user ids."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=rsd).alias("n_users_approx")
    )


def events_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (event_type, month): all four grouping sets — per-cell, each
    one-dimension marginal, and the grand total — in one Expand + hash
    aggregate pass (the rollup twin covers the hierarchical subset)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.cube("event_type", month_str("ts").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


ROLLING_WINDOW_SEC = 3600


def user_rolling_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-1-hour rolling sum/count of value at every event —
    a RANGE frame over event time (the frame-spec vocabulary SURVEY §2.5
    notes the reference lacks), and the standard shape of point-in-time
    feature engineering: one shuffle on user_id, one sort, then each row's
    feature reads only its trailing frame."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-ROLLING_WINDOW_SEC, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("rolling_sum_1h"),
        F.count(F.lit(1)).over(w).alias("rolling_cnt_1h"),
    )


def events_sketch_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates with a portable oracle: approximate answers can't
    hash-match a different engine, so the query emits the EXACT answer plus
    booleans asserting the sketches landed within 5% of it — the oracle
    reproduces the exact column and expects the booleans to be true.

    The sketches are the 100 TB path: HyperLogLog++ distinct count and
    t-digest-style quantiles run in one pass with fixed memory per group,
    where exact distinct/percentile would shuffle the full value sets.
    """
    ev = load(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("_hll"),
        F.percentile("value", F.lit(0.5)).alias("_p50"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("_ap50"),
    )

    def within5(approx: str, exact: str):
        return F.abs(F.col(approx) - F.col(exact)) <= F.abs(F.col(exact)) * 0.05

    return g.select(
        "event_type",
        "n_users",
        within5("_hll", "n_users").alias("hll_ok"),
        within5("_ap50", "_p50").alias("p50_ok"),
    )


PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: one row per user, one count column per event_type. The type
    list is pinned (PIVOT_TYPES) — at scale an unpinned pivot needs an
    extra distinct pass AND makes the output schema data-dependent, so
    production pivots always enumerate."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(PIVOT_TYPES))
        .count()
        .na.fill(0, list(PIVOT_TYPES))
    )


def order_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) over order totals: (o_orderkey, quartile). Equal-height
    bucketing needs a total order; the distributed ntile
    (operators/distsort.py) derives it from range-partitioned prefix
    ranks, so no task ever holds more than its slice — exact SQL NTILE
    semantics for the oracle at any scale."""
    from .distsort import with_ntile

    o = load(spark, sf_dir, "orders")
    return with_ntile(
        o.select("o_orderkey", "o_totalprice"),
        [F.asc("o_totalprice"), F.asc("o_orderkey")],
        4,
        "quartile",
    ).select("o_orderkey", "quartile")


def user_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag windowing: seconds since each user's previous event
    (first event per user -> NULL gap)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return ev.select(
        "event_id",
        "user_id",
        (F.unix_timestamp("ts") - F.unix_timestamp(prev)).alias("gap_sec"),
    )


MEDIAN_PCTS = (0.5, 0.9)


def events_value_median_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n, median_value, p90_value): EXACT per-group
    percentiles via the sort-based percentile aggregate — the exact twin
    of events_value_percentiles' approx path (percentile_approx with its
    error-bound check lives there; this is the group-sized exact answer).

    Scale shape: exact percentile aggregates sort within each group's
    partial state — safe when group CARDINALITY is small (5 event types)
    but each group is huge? No: Spark's percentile agg buffers per-group
    values, so this is the SMALL-GROUP-COUNT/LARGE-GROUP pattern to use
    only when per-group value multisets fit an executor (they do at any
    SF here: numeric doubles, the buffer is a counts map). The unbounded
    alternative at 100 TB is the approx sketch path next door."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile("value", MEDIAN_PCTS[0]), 4).alias("median_value"),
        F.round(F.percentile("value", MEDIAN_PCTS[1]), 4).alias("p90_value"),
    )


def events_exact_median_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row EXACT global median of the event value over the whole
    table, computed scale-safely: the distributed range-partitioned row
    number (operators/distsort.py) gives every row its global rank in
    one range shuffle + an O(#partitions) offset collect, then the one
    or two middle rows are filtered out and averaged. The plan a naive
    `orderBy` + window would funnel through a single task; this one
    never materializes more than a range slice per task at any scale.
    Complements the per-group exact percentiles (bounded-group path) and
    the approx sketch (unbounded path) with the exact-global answer.
    """
    from .distsort import with_running_totals

    ev = load(spark, sf_dir, "events").select("value", "event_id")
    ranked = with_running_totals(
        ev, [F.asc("value"), F.asc("event_id")], sums={}, row_col="rn"
    )
    n = ev.count()
    mid = [(n + 1) // 2, (n + 2) // 2]
    return (
        ranked.where(F.col("rn").isin(mid))
        .agg(
            F.lit(n).alias("n_rows"),
            F.round(F.avg("value"), 4).alias("median_value"),
        )
    )


THROTTLE_SEC = 300  # collapse same-(user, type) bursts within 5 minutes


def events_throttled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, user_id, event_type, kept): burst-collapse throttling —
    an event is dropped when the SAME (user, type) fired within
    THROTTLE_SEC before it (lag-gap rule, the alerting/notification
    dedup a telemetry pipeline applies before fan-out; distinct from
    exact-id dedup, which only removes replays). One per-(user, type)
    window on well-spread composite keys.

    Note the deliberate semantics: the gap is measured to the previous
    RAW event, not the previous KEPT one — the sequential "true
    debounce" variant is order-recursive per key (each verdict depends
    on the previous verdict) and belongs to the stateful-streaming
    family (applyInPandasWithState) if ever needed; the raw-gap rule is
    the stateless approximation production throttles actually use."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        (gap.isNull() | (gap > THROTTLE_SEC)).cast("int").alias("kept"),
    )


ROLLING_ANOM_MIN_N = 5
ROLLING_ANOM_Z = 3.0


def user_rolling_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, user_id, value, window_mu, zscore): events whose value
    sits ROLLING_ANOM_Z population-σ above/below that user's TRAILING
    1-hour window — the point-in-time version of user_value_anomalies
    (which uses each user's whole history and therefore leaks the
    future into the baseline). Same RANGE-frame shape as
    user_rolling_value; windows with fewer than ROLLING_ANOM_MIN_N
    events or zero variance are skipped."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "ts"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-ROLLING_WINDOW_SEC, Window.currentRow)
    )
    mu = F.avg("value").over(w)
    sd = F.stddev_pop("value").over(w)
    n = F.count(F.lit(1)).over(w)
    z = (F.col("value") - mu) / sd
    return (
        ev.select(
            "event_id",
            "user_id",
            "value",
            mu.alias("mu"),
            sd.alias("sd"),
            n.alias("n"),
            z.alias("z"),
        )
        .where((F.col("n") >= ROLLING_ANOM_MIN_N) & (F.col("sd") > 0))
        .where(F.abs("z") > ROLLING_ANOM_Z)
        .select(
            "event_id",
            "user_id",
            "value",
            F.round("mu", 4).alias("window_mu"),
            F.round("z", 4).alias("zscore"),
        )
    )


def events_debounced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, user_id, event_type, kept): TRUE debounce — an event is
    kept only when THROTTLE_SEC has elapsed since the last KEPT event of
    the same (user, type). Unlike events_throttled's raw-gap rule this
    verdict depends on the previous VERDICT (t=0,3,6 with X=5 keeps 0
    and 6; the raw-gap rule keeps only 0), which makes it inherently
    order-recursive per key — no window expresses it.

    The fold runs ENTIRELY JVM-side: one grouped sort_array(collect_list)
    per (user, type) — buffering a group is unavoidable for a sequential
    verdict, and per-key event counts are bounded — then a single
    F.aggregate lambda threads (last_kept_ts, verdicts) through the
    sorted array and explodes back to rows. The first cut used
    applyInPandas; with thousands of tiny groups the per-group Arrow
    round-trip cost 13.6 s at sf0.1 vs ~2 s for this expression fold —
    the standing "UDFs are the slow path" lesson applied to grouped
    folds. The DuckDB oracle replays the same fold as a per-group
    recursive CTE, so the sequential semantics hash-check cross-engine."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_timestamp("ts").alias("sec")
    )
    grouped = ev.groupBy("user_id", "event_type").agg(
        F.sort_array(F.collect_list(F.struct("sec", "event_id"))).alias("evs")
    )
    acc0 = F.named_struct(
        F.lit("last"), F.lit(None).cast("bigint"),
        F.lit("res"),
        F.lit(None).cast("array<struct<event_id:bigint,kept:int>>"),
    )

    def step(acc, e):
        keep = acc["last"].isNull() | (
            (e["sec"] - acc["last"]) > THROTTLE_SEC
        )
        entry = F.struct(
            e["event_id"].alias("event_id"), keep.cast("int").alias("kept")
        )
        return F.named_struct(
            F.lit("last"),
            F.when(keep, e["sec"]).otherwise(acc["last"]),
            F.lit("res"),
            F.when(acc["res"].isNull(), F.array(entry)).otherwise(
                F.concat(acc["res"], F.array(entry))
            ),
        )

    folded = grouped.select(
        "user_id",
        "event_type",
        F.aggregate("evs", acc0, step).getField("res").alias("res"),
    )
    return folded.select(
        "user_id", "event_type", F.explode("res").alias("r")
    ).select(
        F.col("r.event_id").alias("event_id"),
        "user_id",
        "event_type",
        F.col("r.kept").alias("kept"),
    )
