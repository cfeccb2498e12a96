"""Bucketed-table sink for co-located (shuffle-free) joins.

SURVEY.md §4 lists the reference's custom partitioners whose purpose was
to co-locate join/group keys across jobs. The Spark-native equivalent is
``bucketBy``: both sides of a recurring equi-join are written pre-hashed
into the same number of buckets on the join key, so every later join
between them is planned WITHOUT a shuffle exchange on either side — at
100 TB this removes the dominant cost of repeated fact-to-fact joins
(e.g. lineitem ⋈ orders on orderkey in four of the seven reference
queries). ``assert_no_shuffle_join`` is used by tests to pin that
property against the physical plan rather than trusting intent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
) -> None:
    """Persist df as a bucketed (and optionally sorted) managed table.

    Sorting within buckets additionally enables merge-join without a sort
    step (the analogue of the reference's secondary sort, SURVEY §4)."""
    import os
    import shutil

    spark = df.sparkSession
    # a previous process may have left the location without a metastore
    # entry (fresh derby per process) — overwrite can't reclaim that
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.exists(loc):
        shutil.rmtree(loc)

    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, cols[0], *cols[1:]
    )
    if sort_cols:
        s = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(s[0], *s[1:])
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def join_is_shuffle_free(joined: DataFrame) -> bool:
    """True when the executed plan contains no shuffle exchange — the
    co-location property bucketing exists to provide."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan
