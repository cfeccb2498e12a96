"""Distributed total-order primitives: exact global running sums, row
numbers, and ntile bucketing without a single-partition window.

``Window.orderBy(...)`` with no partition key funnels the entire input
through ONE task — the canonical Spark scale-killer (WindowExec even logs
a performance warning). Yet several operators here genuinely need a total
order: greedy token-budget packing, equal-height ntile bucketing, and the
Mann-Whitney rank sum behind AUC. This module provides the scalable
equivalent, the classic distributed prefix-sum:

1. ``repartitionByRange`` on the order key — the same sampled
   RangePartitioner a global ``orderBy`` uses, so partition p holds a
   contiguous slice of the total order (ranges ascend with partition id).
2. An ordinary PARTITIONED window per range slice computes local running
   totals / row numbers — every task sorts only its own slice.
3. Per-partition totals (one row per partition) are collected to the
   driver — an O(#partitions) scalar collect, the same driver-side
   pattern the PageRank loop uses for missing mass — turned into
   exclusive prefix offsets, and broadcast-joined back.

Net cost at any scale: one range shuffle, one tiny offsets job, and one
narrow re-exchange on the partition id (the checkpoint boundary hides the
range partitioning from Catalyst, so the window re-clusters by pid — same
rows, same slices, narrow columns); no task ever materializes more than
its slice. The intermediate is pinned with an eager ``localCheckpoint``
so the offsets job and the main job see the same (sampled, hence
job-dependent) range partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "__ds_pid"


def _range_prefix(
    df: DataFrame, order: list[Column], sum_cols: list[str]
) -> tuple[DataFrame, DataFrame, int]:
    """Range-partition ``df`` by ``order`` and derive per-partition
    exclusive prefix offsets for row count and each of ``sum_cols``.

    Returns (pinned partitioned frame with a ``__ds_pid`` column, the
    broadcastable offsets frame ``(__ds_pid, __ds_row_off, __ds_off_<c>)``,
    total row count).
    """
    spark = df.sparkSession
    try:
        npart = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    except ValueError:
        # some managed runtimes set the conf to a non-numeric value
        # (e.g. "auto"); fall back to the input's own parallelism
        npart = max(df.rdd.getNumPartitions(), 1)
    # eager stays: a lazy checkpoint pinned by the totals collect was
    # A/B-measured in r15 (interleaved min-of-2 triples) as a wash —
    # one fewer job but identical wall — so the long-standing eager
    # materialization keeps its simpler invariant
    part = (
        df.repartitionByRange(npart, *order)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint()
    )
    totals = (
        part.groupBy(_PID)
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            *[F.sum(c).alias(f"__s_{c}") for c in sum_cols],
        )
        .collect()
    )
    totals.sort(key=lambda r: r[_PID])
    dtypes = dict(part.dtypes)
    is_float = {c: dtypes[c] in ("double", "float") for c in sum_cols}
    off_rows: list[tuple] = []
    row_off = 0
    val_off = {c: 0.0 if is_float[c] else 0 for c in sum_cols}
    for r in totals:
        off_rows.append(
            (int(r[_PID]), row_off, *[val_off[c] for c in sum_cols])
        )
        row_off += r["__cnt"]
        for c in sum_cols:
            val_off[c] += r[f"__s_{c}"] or 0
    schema = f"{_PID} int, __ds_row_off bigint" + "".join(
        f", __ds_off_{c} {'double' if is_float[c] else 'bigint'}"
        for c in sum_cols
    )
    offsets = spark.createDataFrame(off_rows, schema)
    return part, offsets, row_off


def with_running_totals(
    df: DataFrame,
    order: list[Column],
    sums: dict[str, str],
    row_col: str | None = None,
) -> DataFrame:
    """Append exact global running totals over a total order.

    ``sums`` maps output column -> input column (inclusive running sum in
    ``order``); ``row_col`` optionally adds the global 1-based row number.
    ``order`` must be a total order (callers tie-break on a unique key) or
    running values within a tie group are frame-order-dependent.
    """
    part, offsets, _ = _range_prefix(df, order, sorted(set(sums.values())))
    w = Window.partitionBy(_PID).orderBy(*order)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    proj: list[Column] = [F.col(c) for c in df.columns]
    for out_col, in_col in sums.items():
        proj.append(
            (F.col(f"__ds_off_{in_col}") + F.sum(in_col).over(wf)).alias(out_col)
        )
    if row_col is not None:
        proj.append((F.col("__ds_row_off") + F.row_number().over(w)).alias(row_col))
    return part.join(F.broadcast(offsets), _PID).select(*proj)


def with_ntile(
    df: DataFrame, order: list[Column], n: int, out_col: str = "ntile"
) -> DataFrame:
    """Append SQL ``NTILE(n) OVER (ORDER BY order)`` — equal-height
    buckets, the first ``N % n`` buckets one row larger — computed from
    the distributed global row number instead of a single-partition
    window. Matches Spark's and DuckDB's NTILE bit-for-bit.
    """
    part, offsets, total = _range_prefix(df, order, [])
    w = Window.partitionBy(_PID).orderBy(*order)
    rn = F.col("__ds_row_off") + F.row_number().over(w)
    size, rem = divmod(total, n)
    boundary = rem * (size + 1)
    tile = F.when(rn <= boundary, F.ceil(rn / (size + 1))).otherwise(
        rem + F.ceil((rn - boundary) / max(size, 1))
    )
    return part.join(F.broadcast(offsets), _PID).select(
        *[F.col(c) for c in df.columns], tile.cast("int").alias(out_col)
    )
