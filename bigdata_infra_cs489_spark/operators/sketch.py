"""Count-min sketch: fixed-size frequency summaries for heavy-hitter
detection over unbounded key domains.

Extends the reference's counter/side-aggregate family (SURVEY §2 A8,
events_sketch_check's exact-vs-approx pattern): at 100 TB you cannot
hash-aggregate an open token/URL/user domain exactly, but a CMS is a
constant D×W grid of counters that merges associatively — map-side
partial aggregation compresses every partition to ≤ D·W cells, and
estimates are upper bounds (est >= true count, within eps·N w.h.p.).

All hashing rides the shared portable h8 primitive so the DuckDB oracle
reproduces every cell and estimate exactly; the exact counts carried
next to the estimates here are the verification twin (same role as
events_sketch_check), not part of the scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import h8
from ..functions.text import tokenize
from ..sources.tables import load

CMS_DEPTH = 4  # independent hash rows
CMS_WIDTH = 256  # counters per row
CMS_HH_PPM = 10_000  # heavy hitter: estimated share >= 1% of all tokens


def _bucket(token: Column, d: int) -> Column:
    """Row-d counter index for a token: portable h8 of 'd:token' mod W."""
    return (
        h8(F.concat_ws(":", F.lit(str(d)), token)) % CMS_WIDTH
    ).cast("int")


def cms_build(tokens: DataFrame, col: str = "token") -> DataFrame:
    """(d, bucket, cell_n): the D×W sketch grid from a stream of keys.
    One narrow pass; the groupBy partial-aggregates map-side so the
    shuffle carries at most D·W rows per partition regardless of input
    size."""
    cells = tokens.select(
        F.posexplode(
            F.array(*[_bucket(F.col(col), d) for d in range(CMS_DEPTH)])
        ).alias("d", "bucket")
    )
    return cells.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cell_n"))


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, col: str = "token"
) -> DataFrame:
    """(key..., cms_est): point estimates = min over rows of the key's
    cell. The sketch is at most D·W rows, so it broadcasts; the probe is
    a narrow pass over the key set."""
    probes = keys.select(
        "*",
        F.posexplode(
            F.array(*[_bucket(F.col(col), d) for d in range(CMS_DEPTH)])
        ).alias("d", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy(*keys.columns)
        .agg(F.min("cell_n").alias("cms_est"))
    )


def cms_build_weighted(
    counts: DataFrame, col: str = "token", weight: str = "n"
) -> DataFrame:
    """(d, bucket, cell_n) from an already-aggregated (key, count) table —
    identical cells to cms_build over the raw stream (each key
    contributes its count to the same D buckets), one corpus pass
    cheaper when the exact aggregate is being computed anyway."""
    cells = counts.select(
        F.col(weight),
        F.posexplode(
            F.array(*[_bucket(F.col(col), d) for d in range(CMS_DEPTH)])
        ).alias("d", "bucket"),
    )
    return cells.groupBy("d", "bucket").agg(F.sum(weight).alias("cell_n"))


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(token, exact_n, cms_est, overcount): tokens whose ESTIMATED share
    of the corpus is >= CMS_HH_PPM parts-per-million, with the exact
    count alongside as the verification twin — overcount = est - exact
    is always >= 0, the CMS one-sided error guarantee the oracle pins.

    ONE corpus scan: the per-token exact aggregate (which this checking
    query needs anyway) feeds both the weighted sketch build and the
    probe set; the corpus total folds in as a broadcast scalar aggregate
    of the same vocabulary-sized table, so nothing re-reads documents."""
    toks = (
        load(spark, sf_dir, "documents", parallelize=True)
        .select(F.explode(tokenize("text")).alias("token"))
    )
    exact = (
        toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n")).cache()
    )
    sketch = cms_build_weighted(exact, "token", "exact_n")
    total = exact.agg(F.sum("exact_n").alias("total"))
    est = cms_estimate(sketch, exact)
    return (
        est.crossJoin(F.broadcast(total))
        .where(F.col("cms_est") * 1_000_000 >= CMS_HH_PPM * F.col("total"))
        .select(
            "token",
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
        )
    )


BLOOM_BITS = 4096  # m
BLOOM_HASHES = 3  # k
BLOOM_ACCTBAL_MIN = 7500.0


def _bloom_positions(key: Column, prefix: str = "b") -> Column:
    """The k bit positions of a key: portable h8 of 'b<i>:<key>' mod m."""
    return F.array(
        *[
            (
                h8(F.concat_ws(":", F.lit(f"{prefix}{i}"), key.cast("string")))
                % BLOOM_BITS
            ).cast("int")
            for i in range(BLOOM_HASHES)
        ]
    )


def bloom_prefilter_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row (n_keys, n_bits_set, n_pass_bloom, n_true, n_false_pos):
    build a Bloom filter over a small key set (high-balance customers),
    probe every order against it, and compare with the exact semi-join —
    the join-prefilter sketch that at 100 TB drops most of a fact table
    before it ever reaches the shuffle, at the cost of a bounded
    false-positive rate (zero false negatives, asserted by the oracle
    since both engines compute identical portable hashes).

    Plan shape: the bit-position set is at most m rows, broadcast to the
    probe; membership = count of matched positions == k per probe key.
    The exact n_true twin is the verification column, same role as
    events_sketch_check's exact side. Fully lazy: all five counters fold
    into ONE returned plan (scalar aggregates cross-joined), so the probe
    pipeline runs once — no driver-side count() round trips. NULL keys
    are excluded on both sides up front (Bloom membership of NULL is
    undefined, and the engines' NULL-in-hash renderings differ)."""
    cust = load(spark, sf_dir, "customer").where(
        F.col("c_acctbal") > BLOOM_ACCTBAL_MIN
    )
    keys = cust.select(F.col("c_custkey").alias("key")).where(
        F.col("key").isNotNull()
    ).distinct()
    bits = (
        keys.select(F.explode(_bloom_positions(F.col("key"))).alias("pos"))
        .distinct()
    )
    orders = (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", F.col("o_custkey").alias("key"))
        .where(F.col("key").isNotNull())
    )
    probe = orders.select(
        "o_orderkey", "key", F.explode(_bloom_positions(F.col("key"))).alias("pos")
    )
    per_order = (
        probe.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("o_orderkey", "key")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("hits"))
        .join(F.broadcast(keys.withColumn("member", F.lit(1))), "key", "left")
        .select(
            (F.col("hits") == BLOOM_HASHES).cast("bigint").alias("bloom_pass"),
            F.coalesce(F.col("member"), F.lit(0)).cast("bigint").alias("member"),
        )
    )
    agg = per_order.agg(
        F.sum("bloom_pass").alias("n_pass_bloom"),
        F.sum("member").alias("n_true"),
    )
    return (
        keys.agg(F.count(F.lit(1)).alias("n_keys"))
        .crossJoin(bits.agg(F.count(F.lit(1)).alias("n_bits_set")))
        .crossJoin(agg)
        .select(
            "n_keys",
            "n_bits_set",
            "n_pass_bloom",
            "n_true",
            (F.col("n_pass_bloom") - F.col("n_true")).alias("n_false_pos"),
        )
    )
