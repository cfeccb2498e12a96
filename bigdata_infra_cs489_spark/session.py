"""SparkSession factory.

Single place where engine-wide execution knobs live. The settings are chosen
for correctness at any scale and tuned for the local[32] / 128 GiB test box;
on a real cluster only `shuffle.partitions` (handled by AQE coalescing) and
memory sizing change.

Scale rationale (100 TB target):
- AQE on: runtime re-planning converts sort-merge joins to broadcast when the
  built side turns out small, coalesces tiny post-shuffle partitions, and
  splits skewed ones (skew-join). This replaces every hand-rolled partitioning
  trick in the reference (custom partitioners, combiner tuning, split-size
  knobs — SURVEY.md §4).
- shuffle.partitions is a ceiling; AQE coalesces down. At cluster scale you
  raise the ceiling (e.g. 2000) and AQE still right-sizes each exchange.
- Arrow enabled: every pandas_udf / applyInPandas boundary (SGD fold,
  multimodal decode) moves columnar batches, not pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "bigdata-infra-cs489-spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``) when
    no cluster master is configured; on a real deployment the caller's
    spark-submit master wins because an active session is reused as-is.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active

    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # let the planner pick shuffled-hash over sort-merge when its size
        # conditions hold (build side per-partition small): skips both
        # sort legs of the join. Guide-recommended baseline; the planner
        # still requires the build side to fit its local-map bound, and
        # AQE skew handling applies to SHJ the same way. Measured r15 on
        # the remaining shuffle-join queries: equal or faster everywhere
        # (near_dup_method_audit 6.6->4.5 s, lsh_banding_recall
        # 2.7->2.3 s at sf0.1); at cluster scale the same choice holds
        # wherever partition sizing keeps build maps bounded, and
        # SPARK_GRAFT_PREFER_SMJ=true restores the default for
        # deployments that want sort-merge's unconditional spill path.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # long-lived sessions (bench sweeps, services) accumulate broadcast
        # pieces and shuffle state that the ContextCleaner only reclaims
        # after a driver GC; with a large heap, full GCs are rare enough
        # that state piles up and mid-query GC pauses dominate tail
        # queries. A periodic GC bounds that.
        .config("spark.cleaner.periodicGC.interval", "2min")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
