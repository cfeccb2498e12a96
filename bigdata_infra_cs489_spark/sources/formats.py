"""Reference-native file-format connectors (SURVEY §2.1 S1/S2/S8, M3 input).

The reference's inputs are all line-oriented text, parsed positionally at
every use site:

- pipe-delimited TPC-H ``.tbl`` tables (S2; reference a5/Q1.scala:31-32
  ``split("\\|", 12)(10)``),
- raw text corpora, one document per line, docno = byte offset (S1;
  a0/WordCount.java:155, a3/BuildInvertedIndexCompressed.java:45,68),
- whitespace-delimited adjacency lists ``node nbr1 nbr2 ...``
  (a4/BuildPersonalizedPageRankRecords.java:81-97).

These connectors let a user of the reference point this engine at the very
same files. Scale stance: text re-parses every column on every query, so
the intended pattern at 100 TB is read-once -> ``ingest_tbl_to_parquet``
-> query the columnar copy (pruning + pushdown + row-group stats). The
readers themselves are single-pass distributed scans (``spark.read.csv`` /
``spark.read.text``), no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _schema(cols: list[tuple[str, object]]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in cols])


# Full TPC-H dbgen column lists (public spec, revision 2.x). Money columns
# are DoubleType to match the fixture tables; dbgen dates parse as DateType.
TPCH_TBL_SCHEMAS: dict[str, StructType] = {
    "region": _schema(
        [("r_regionkey", IntegerType()), ("r_name", StringType()), ("r_comment", StringType())]
    ),
    "nation": _schema(
        [
            ("n_nationkey", IntegerType()),
            ("n_name", StringType()),
            ("n_regionkey", IntegerType()),
            ("n_comment", StringType()),
        ]
    ),
    "customer": _schema(
        [
            ("c_custkey", LongType()),
            ("c_name", StringType()),
            ("c_address", StringType()),
            ("c_nationkey", IntegerType()),
            ("c_phone", StringType()),
            ("c_acctbal", DoubleType()),
            ("c_mktsegment", StringType()),
            ("c_comment", StringType()),
        ]
    ),
    "supplier": _schema(
        [
            ("s_suppkey", LongType()),
            ("s_name", StringType()),
            ("s_address", StringType()),
            ("s_nationkey", IntegerType()),
            ("s_phone", StringType()),
            ("s_acctbal", DoubleType()),
            ("s_comment", StringType()),
        ]
    ),
    "part": _schema(
        [
            ("p_partkey", LongType()),
            ("p_name", StringType()),
            ("p_mfgr", StringType()),
            ("p_brand", StringType()),
            ("p_type", StringType()),
            ("p_size", IntegerType()),
            ("p_container", StringType()),
            ("p_retailprice", DoubleType()),
            ("p_comment", StringType()),
        ]
    ),
    "partsupp": _schema(
        [
            ("ps_partkey", LongType()),
            ("ps_suppkey", LongType()),
            ("ps_availqty", IntegerType()),
            ("ps_supplycost", DoubleType()),
            ("ps_comment", StringType()),
        ]
    ),
    "orders": _schema(
        [
            ("o_orderkey", LongType()),
            ("o_custkey", LongType()),
            ("o_orderstatus", StringType()),
            ("o_totalprice", DoubleType()),
            ("o_orderdate", DateType()),
            ("o_orderpriority", StringType()),
            ("o_clerk", StringType()),
            ("o_shippriority", IntegerType()),
            ("o_comment", StringType()),
        ]
    ),
    "lineitem": _schema(
        [
            ("l_orderkey", LongType()),
            ("l_partkey", LongType()),
            ("l_suppkey", LongType()),
            ("l_linenumber", IntegerType()),
            ("l_quantity", DoubleType()),
            ("l_extendedprice", DoubleType()),
            ("l_discount", DoubleType()),
            ("l_tax", DoubleType()),
            ("l_returnflag", StringType()),
            ("l_linestatus", StringType()),
            ("l_shipdate", DateType()),
            ("l_commitdate", DateType()),
            ("l_receiptdate", DateType()),
            ("l_shipinstruct", StringType()),
            ("l_shipmode", StringType()),
            ("l_comment", StringType()),
        ]
    ),
}


def read_tbl(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """Scan a pipe-delimited ``.tbl`` file/dir into a typed DataFrame (S2).

    ``schema`` is a StructType or a TPC-H table name (TPCH_TBL_SCHEMAS).
    dbgen's trailing ``|`` is tolerated (the extra empty field is ignored).
    Unlike the reference's per-query ``split("\\|", n)(i)``, the schema is
    declared once and Spark's CSV reader prunes/parses accordingly.
    """
    if isinstance(schema, str):
        schema = TPCH_TBL_SCHEMAS[schema]
    return spark.read.csv(path, sep="|", schema=schema, dateFormat="yyyy-MM-dd")


def write_tbl(df: DataFrame, path: str) -> None:
    """Write a DataFrame as pipe-delimited text (S8 sink, ``.tbl`` layout).

    Dates/timestamps render as ISO ``yyyy-MM-dd [HH:mm:ss]`` so lexical
    order equals date order — the property every reference date predicate
    relies on (SURVEY §1.2)."""
    df.write.mode("overwrite").csv(
        path, sep="|", dateFormat="yyyy-MM-dd", timestampFormat="yyyy-MM-dd HH:mm:ss"
    )


def ingest_tbl_to_parquet(
    spark: SparkSession, src: str, dst: str, schema: StructType | str
) -> None:
    """One-pass text -> columnar ingest: the scale path for .tbl inputs."""
    read_tbl(spark, src, schema).write.mode("overwrite").parquet(dst)


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Scan a line-per-document corpus as (doc_id, text) (S1).

    The reference keys documents by byte offset (a3/BuildInvertedIndex
    Compressed.java:68 casts the TextInputFormat offset); here doc_id is
    ``monotonically_increasing_id`` — like the offset it is unique and
    stable for a given file layout, without forcing a single-threaded scan.
    """
    return spark.read.text(path).select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("value").alias("text"),
    )


def write_text(df: DataFrame, path: str) -> None:
    """Single-string-column DataFrame -> plain text lines (S8)."""
    df.write.mode("overwrite").text(path)


def read_adjacency(spark: SparkSession, path: str) -> DataFrame:
    """Scan whitespace adjacency lines ``node nbr1 nbr2 ...`` into
    (id bigint, adj array<bigint>) node records — the input form of the
    PageRank graph build (a4/BuildPersonalizedPageRankRecords.java:81-97).
    Nodes with no listed neighbors (dangling) get an empty array."""
    parts = F.split(F.trim("value"), r"\s+")
    return spark.read.text(path).select(
        F.element_at(parts, 1).cast("bigint").alias("id"),
        F.transform(F.slice(parts, 2, F.size(parts) - 1), lambda x: x.cast("bigint")).alias(
            "adj"
        ),
    )


def write_adjacency(df: DataFrame, path: str) -> None:
    """(id, adj array) node records -> whitespace adjacency text lines."""
    out = df.select(
        F.concat_ws(
            " ",
            F.col("id").cast("string"),
            F.concat_ws(" ", F.transform("adj", lambda x: x.cast("string"))),
        ).alias("value")
    )
    write_text(out, path)


def q_tbl_scan_nation(spark: SparkSession, sf_dir: str):
    """Registered S2 round-trip: fixture nation -> .tbl text -> typed scan.

    Proves the delimited-text source/sink against the DuckDB oracle (which
    reads the parquet original): identical rows means the text layer loses
    nothing. Writes under the system temp dir, keyed by scale factor."""
    import os
    import tempfile

    from .tables import load

    src = load(spark, sf_dir, "nation")
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_tbl_nation_{sf_tag}")
    write_tbl(src, path)
    return read_tbl(spark, path, src.schema)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Scan JSON-lines (one JSON object per line). An explicit schema skips
    the inference pass — mandatory at scale (inference reads the data
    twice) and the only way to keep types stable across engines."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """DataFrame -> JSON-lines (S8 twin for nested/self-describing rows —
    the interchange format corpus pipelines actually exchange)."""
    df.write.mode("overwrite").json(path)


def q_orc_roundtrip_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered columnar-interchange round-trip: fixture customer ->
    ORC -> scan. ORC is the other columnar format warehouses exchange;
    Spark's built-in reader gives it the same pushdown/pruning/row-group
    machinery as parquet. Hash parity against the parquet-reading oracle
    proves type fidelity (int64/int32/string/double) through the sink."""
    import os
    import tempfile

    from .tables import load

    src = load(spark, sf_dir, "customer")
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_orc_customer_{sf_tag}")
    src.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


def q_jsonl_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered JSONL round-trip: fixture events -> JSON-lines sink ->
    schema'd scan -> per-type aggregate. JSONL is the self-describing
    interchange format corpus pipelines exchange; the explicit read
    schema (no inference pass) plus hash parity against the
    parquet-reading oracle pins type fidelity — including the timestamp
    ISO render/parse round trip — through the text sink."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from .tables import load

    src = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_jsonl_events_{sf_tag}"
    )
    # Spark's default JSON timestampFormat truncates to milliseconds;
    # pin a microsecond pattern on BOTH sides so the round trip is
    # lossless (the oracle compares micros).
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    src.write.mode("overwrite").option("timestampFormat", ts_fmt).json(path)
    back = (
        spark.read.schema(
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )
        .option("timestampFormat", ts_fmt)
        .json(path)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "first_ts"
        ),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "last_ts"
        ),
    )
