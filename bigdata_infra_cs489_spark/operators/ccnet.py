"""CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): split
each language's documents into head / middle / tail terciles by
language-model perplexity, the canonical quality-tier signal CC-corpus
pipelines ship (train on head+middle, drop or downweight tail).

The LM is the repo's corpus-trained add-k bigram model
(text_analytics.bigram_lm_perplexity — the KenLM stand-in whose oracle
is already registered); bucketing composes on top of its per-doc
avg_nll. No reference counterpart (north-star extension family, the
curation shelf next to text_quality and gopher_quality_flags).

Scale/determinism design:
- bucket assignment NEVER uses a lang-partitioned window (language
  cardinality is tiny, so at 100 TB each lang partition is a giant
  pinned task): the GLOBAL distsort row number over the total order
  (lang, avg_nll, doc_id) plus one broadcast per-lang (first_rn, n)
  aggregate converts global rank to within-lang rank — the
  source_quality_percentiles / top_terms_per_lang offset trick;
- the tercile index is exact integer arithmetic,
  ((rank_in_lang - 1) * 3) DIV n_lang, on a 6dp-ROUNDED avg_nll with a
  doc_id tie-break, so the assignment can never flip cross-engine on a
  last-ulp perplexity disagreement;
- the per-bucket report aggregates exact micro-nat integers
  (the gopher_pass_rates ppm discipline) — no floating mean ordering
  anywhere.

Docs that tokenize to fewer than 2 tokens have no bigram to score and
are excluded, matching the LM operator's own domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

CCNET_N_BUCKETS = 3
CCNET_BUCKET_NAMES = ("head", "middle", "tail")


def _scored_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bigrams, avg_nll, lang): the scoreable docs with their
    language — the pre-ranking frame. The per-doc LM scores come from
    the STANDING perplexity metadata table (standing_lm_scores —
    trained + scored once per data generation, probed as a parquet
    scan); the registered bigram_lm_perplexity card remains the inline
    bootstrap of that table. Split out so the probe pin
    (tests/test_ccnet.py) can inspect inputFiles() below the distsort
    checkpoint that truncates the bucket card's lineage."""
    from .text_analytics import standing_lm_scores

    ppl = standing_lm_scores(spark, sf_dir)
    langs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return ppl.join(langs, "doc_id")


def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, n_bigrams, avg_nll, bucket): every scoreable
    document with its within-language perplexity tercile — head is the
    lowest-perplexity (most fluent) third."""
    from .distsort import with_running_totals

    scored = _scored_docs(spark, sf_dir)
    order = [F.asc("lang"), F.asc("avg_nll"), F.asc("doc_id")]
    rn = with_running_totals(scored, order, sums={}, row_col="grn")
    per_lang = rn.groupBy("lang").agg(
        F.min("grn").alias("first_rn"), F.count(F.lit(1)).alias("n_lang")
    )
    names = F.array(*[F.lit(n) for n in CCNET_BUCKET_NAMES])
    idx = F.expr(f"CAST(((grn - first_rn) * {CCNET_N_BUCKETS}) DIV n_lang AS INT)")
    return rn.join(F.broadcast(per_lang), "lang").select(
        "doc_id",
        "lang",
        "n_bigrams",
        "avg_nll",
        F.element_at(names, idx + 1).alias("bucket"),
    )


def ccnet_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, bucket, n_docs, min_nll, max_nll, mean_nll_micro): the
    per-tier corpus card — tier boundaries and exact integer micro-nat
    means a pipeline owner reads before choosing which tiers to train
    on. One partial-aggregated groupBy over the bucketed docs; the mean
    is rounded integer division of exact micro-nat sums."""
    b = ccnet_perplexity_buckets(spark, sf_dir)
    micro = F.expr("CAST(floor(avg_nll * 1000000 + 0.5) AS BIGINT)")
    return (
        b.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("avg_nll").alias("min_nll"),
            F.max("avg_nll").alias("max_nll"),
            F.sum(micro).cast("bigint").alias("sum_micro"),
        )
        .select(
            "lang",
            "bucket",
            "n_docs",
            "min_nll",
            "max_nll",
            F.expr(
                "CAST((sum_micro + n_docs DIV 2) DIV n_docs AS BIGINT)"
            ).alias("mean_nll_micro"),
        )
    )


def source_perplexity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, mean_nll_micro, head_docs, middle_docs,
    tail_docs, head_ppm): the per-source LM-quality ranking card — the
    RefinedWeb/CCNet-style view a pipeline owner reads to decide which
    SOURCES to upweight: a source whose documents skew into the
    within-language head tercile is fluent; one skewing tail is noisy
    or off-language. Composes the tercile assignment (per-language, so
    a low-resource language's source is never punished for its
    language prior) with the documents' source column.

    Shape: one doc_id-keyed narrow join of the bucketed docs against
    the source column, one partial-aggregated groupBy(source) with
    exact micro-nat means and conditional tercile counts; head_ppm is
    exact rounded integer division. Output is #sources rows."""
    b = ccnet_perplexity_buckets(spark, sf_dir)
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    micro = F.expr("CAST(floor(avg_nll * 1000000 + 0.5) AS BIGINT)")
    j = b.join(src, "doc_id")
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(micro).cast("bigint").alias("sum_micro"),
            F.coalesce(
                F.sum(F.when(F.col("bucket") == "head", 1)), F.lit(0)
            ).cast("bigint").alias("head_docs"),
            F.coalesce(
                F.sum(F.when(F.col("bucket") == "middle", 1)), F.lit(0)
            ).cast("bigint").alias("middle_docs"),
            F.coalesce(
                F.sum(F.when(F.col("bucket") == "tail", 1)), F.lit(0)
            ).cast("bigint").alias("tail_docs"),
        )
        .select(
            "source",
            "n_docs",
            F.expr(
                "CAST((sum_micro + n_docs DIV 2) DIV n_docs AS BIGINT)"
            ).alias("mean_nll_micro"),
            "head_docs",
            "middle_docs",
            "tail_docs",
            F.expr(
                "CAST((head_docs * 1000000 + n_docs DIV 2)"
                " DIV greatest(n_docs, 1) AS BIGINT)"
            ).alias("head_ppm"),
        )
    )
