"""Temporal joins over the events table: as-of join and interval (range)
join — operator families the reference lacks entirely (SURVEY §2.3: "No
theta-join, range-join, as-of join"), but that any time-series / telemetry
workload needs. Both are built as compositions of existing DataFrame ops
(no UDFs), picked for their 100 TB behavior:

- As-of join: the naive formulation is a non-equi self-join (quadratic per
  user). We instead union the two sides and take ONE window pass over
  (user_id, time) — a single shuffle keyed by user_id, O(n log n) sort per
  partition, no join at all. This is the same trick streaming engines use
  for stream-to-stream as-of.
- Interval join: a pure range predicate (no equi key) would force a
  broadcast-nested-loop scan — O(points x intervals). We bin time into
  fixed-width buckets, explode each interval into the buckets it overlaps
  (<= 2 for window <= bucket width), and equi-join on the bucket id, then
  re-check the exact range. Candidate pairs collapse from |P|x|I| to
  bucket co-occupancy; the shuffle key is the bucket, so temporal skew
  (hot minutes) is the thing to watch — mitigate with smaller buckets or
  salting (functions/skew.py) if one bucket dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load

TS_FMT = "yyyy-MM-dd HH:mm:ss"

ASOF_LEFT_TYPE = "view"  # each of these events...
ASOF_RIGHT_TYPE = "click"  # ...grabs its user's most recent one of these

ERR_WINDOW_SEC = 600  # interval length for the range join
_BUCKET_US = ERR_WINDOW_SEC * 1_000_000  # bucket width == window length


def asof_last_event(
    spark: SparkSession,
    sf_dir: str,
    left_type: str = ASOF_LEFT_TYPE,
    right_type: str = ASOF_RIGHT_TYPE,
) -> DataFrame:
    """For every `left_type` event: the timestamp of the same user's most
    recent strictly-earlier `right_type` event (NULL if none) and how many
    preceded it. Strictly-earlier = microsecond precision, matching a
    TIMESTAMP `<` comparison.

    One shuffle (by user_id), one sort, zero joins: both event streams are
    unioned, and a range frame ending at -1 microsecond aggregates only
    right-side rows strictly before the current row.
    """
    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin(left_type, right_type))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.unix_micros("ts").alias("us"),
            (F.col("event_type") == right_type).cast("long").alias("is_right"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    right_us = F.when(F.col("is_right") == 1, F.col("us"))
    return (
        ev.withColumn("prior_cnt", F.sum("is_right").over(w))
        .withColumn("last_us", F.max(right_us).over(w))
        .where(F.col("is_right") == 0)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", TS_FMT).alias("view_ts"),
            F.coalesce("prior_cnt", F.lit(0)).alias("prior_click_cnt"),
            F.date_format(F.timestamp_micros("last_us"), TS_FMT).alias(
                "last_click_ts"
            ),
        )
    )


def error_click_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: for each 'error' event, count 'click' events (any
    user) inside [error_ts, error_ts + ERR_WINDOW_SEC) — half-open, micro-
    second precision. Binned: intervals explode into the <=2 buckets they
    overlap, points carry their single bucket, and the equi-join on bucket
    bounds candidates to co-bucket pairs; each (interval, point) pair is
    produced exactly once because the point's bucket is unique.
    """
    ev = load(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    us = F.unix_micros("ts")
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id",
        "ts",
        us.alias("lo"),
        (us + F.lit(ERR_WINDOW_SEC * 1_000_000)).alias("hi"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        us.alias("p_us"), F.floor(us / _BUCKET_US).alias("bucket")
    )
    candidates = (
        errors.withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("lo") / _BUCKET_US),
                    F.floor((F.col("hi") - 1) / _BUCKET_US),
                )
            ),
        )
        .join(clicks, "bucket")
        .where((F.col("p_us") >= F.col("lo")) & (F.col("p_us") < F.col("hi")))
    )
    counts = candidates.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("click_cnt")
    )
    return (
        errors.join(counts, "event_id", "left")
        .select(
            "event_id",
            F.date_format("ts", TS_FMT).alias("error_ts"),
            F.coalesce("click_cnt", F.lit(0).cast("long")).alias("click_cnt"),
        )
    )
