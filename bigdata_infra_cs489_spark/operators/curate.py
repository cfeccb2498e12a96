"""End-to-end corpus curation: the "100 TB pretraining-data job" that the
rest of the repo's families exist to serve, composed as ONE declarative
DataFrame DAG with zero driver round-trips between stages:

    exact dedup (md5 canonical)               operators/dedup.py
      -> near-dup keep-best representative    operators/dedup.py
      -> quality gate                         operators/textstats.py
      -> repeated-span budget gate            operators/spans.py
      -> leakage-safe cluster-hashed split    operators/sampling.py
      -> greedy token-budget pack             operators/distsort.py

Stages meet only through doc_id-keyed narrow joins (no text column
crosses a stage boundary): the MinHash/CC lineage, the k-gram span
lineage, and the quality lineage each scan the corpus once and reduce to
per-doc scalars before joining. The expensive iterative cluster
assignment is computed ONCE and feeds both keep-best selection and the
split (composing the standalone operators would pay it twice — see the
inline note); per-stage semantics stay bit-identical to the standalone
oracled operators, pinned by tests/test_curate.py. The single
total-order step (greedy packing) rides the range-partitioned prefix
machinery, never a partition-less window.

No reference counterpart (north-star extension family); the DuckDB twin
replays the identical chain in plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import h8
from ..sources.tables import load
from .dedup import q_exact_dedup, q_near_duplicate_clusters
from .distsort import with_running_totals
from .sampling import CLUSTER_SPLIT_SALT, TRAIN_PCT, VAL_PCT
from .spans import dup_span_stats
from .textstats import text_quality

CURATE_MIN_QUALITY = 0.5  # keep docs with quality_score >= this
# span gate kept in exact integer arithmetic (dup_tokens * DEN <= n_tokens)
# so the cross-engine comparison never rides on a rounded fraction
CURATE_MAX_DUP_DEN = 2  # i.e. drop docs with > 1/2 of tokens duplicated
CURATE_TOKEN_BUDGET = 12_000  # kept-token budget for the packed corpus


def corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id, cluster_size, split, n_tokens, dup_tokens,
    kept_tokens, quality_score, cum_kept_tokens): the curated, packed
    corpus — one row per document that (a) is the canonical copy of its
    exact-duplicate class, (b) is the keep-best representative of its
    near-dup cluster, (c) passes the quality gate, (d) has at most
    1/CURATE_MAX_DUP_DEN of its tokens inside corpus-repeated spans, and
    (e) fits the greedy quality-first token budget counted over
    kept_tokens (= tokens remaining after span stripping). The split
    column is the leakage-safe cluster-hashed train/val/test assignment.
    """
    exact_ok = (
        q_exact_dedup(spark, sf_dir).where(~F.col("is_duplicate")).select("doc_id")
    )
    # The iterative MinHash/CC cluster assignment is the expensive stage,
    # and composing the standalone dedup_keep_best + leakage_safe_split
    # operators would run it TWICE (each re-derives clusters; the
    # checkpointed iterative lineage is opaque to Catalyst's subplan
    # sharing). Compute clusters once; keep-best is a per-cluster window
    # on top, and the split is a pure hash expression on the surviving
    # rep's cluster_id — no second lineage, no extra join. Semantic
    # equality with the standalone operators is pinned by
    # tests/test_curate.py::test_stages_agree_with_standalone_operators.
    clusters = q_near_duplicate_clusters(spark, sf_dir)
    chars = load(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n_chars")
    )
    w = Window.partitionBy("cluster_id")
    ranked = (
        clusters.join(chars, "doc_id")
        .withColumn(
            "rn", F.row_number().over(w.orderBy(F.desc("n_chars"), F.asc("doc_id")))
        )
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
    )
    bucket = (
        h8(F.concat(F.col("cluster_id").cast("string"), F.lit(CLUSTER_SPLIT_SALT)))
        % 100
    )
    reps = ranked.where(F.col("rn") == 1).select(
        "doc_id",
        "cluster_id",
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )
    spans = dup_span_stats(spark, sf_dir).select("doc_id", "n_tokens", "dup_tokens")
    qual = text_quality(spark, sf_dir).select("doc_id", "quality_score")
    kept = (
        reps.join(exact_ok, "doc_id")
        .join(spans, "doc_id")
        .join(qual, "doc_id")
        .where(
            (F.col("quality_score") >= CURATE_MIN_QUALITY)
            & (F.col("dup_tokens") * CURATE_MAX_DUP_DEN <= F.col("n_tokens"))
        )
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            "split",
            "n_tokens",
            "dup_tokens",
            (F.col("n_tokens") - F.col("dup_tokens")).alias("kept_tokens"),
            "quality_score",
        )
    )
    packed = with_running_totals(
        kept,
        [F.desc("quality_score"), F.asc("doc_id")],
        {"cum_kept_tokens": "kept_tokens"},
    )
    return packed.where(F.col("cum_kept_tokens") <= CURATE_TOKEN_BUDGET)
