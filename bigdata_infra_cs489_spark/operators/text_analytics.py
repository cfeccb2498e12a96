"""Text analytics: word count, prefix count, bigram relative frequency, PMI.

Reference (all under /root/reference/src/main/):
- word count:  java/.../assignment0/WordCount.java:42-53 (tokenize + sum by key)
- prefix count: java/.../assignment0/PrefixCount.java:43-57 (2-char prefix)
- bigram rel. freq: scala/.../assignment2/ComputeBigramRelativeFrequencyPairs.scala:55-95
  (pairs + '*'-marginal + secondary sort) and ...Stripes.scala (same result via maps)
- PMI: java/.../assignment1/PairsPMI.java:48-74 (per-line distinct, 100-token cap,
  >=10 threshold) + CooccurrencePairs.java:57-67,120-135 (pair counts, PMI formula)

Spark-first translation notes:
- The reference's secondary-sort marginal trick (emit (w,'*') rows, custom
  partitioner, stateful partition scan) collapses to a window aggregate:
  ``sum(cnt) over (partition by left)``. One shuffle on the bigram key, no
  custom partitioner, no row-order dependence — identical math.
- The PMI two-job pipeline with a DistributedCache side file collapses to a
  broadcast join of the (small, vocabulary-sized) word-line-count aggregate
  against the pair counts. The driver never materializes data-sized state.
- Per-line pair generation explodes the (distinct, capped) token array twice
  *without* an intermediate shuffle: the second explode runs on the row that
  still carries the array. The only shuffles are the final groupBys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numerics import floor_round

from ..functions.text import tokenize
from ..sources.tables import load

MIN_COUNT = 10  # reference threshold (PairsPMI.java:107, CooccurrencePairs.java:126)
PMI_TOKEN_CAP = 100  # PairsPMI.java:56 (first 100 non-empty cleaned tokens)


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text plays the reference's one-line-per-document corpus."""
    return load(spark, sf_dir, "documents", parallelize=True).select("doc_id", "text")


def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token -> total occurrences (WordCount.java:42-53, reducer :94-105).

    Map-side partial aggregation (the reference's combiner / in-mapper
    combining, MyMapperIMC :56-87) is automatic in Tungsten hash aggregate.
    """
    from ..functions.text import exploded_tokens

    return (
        exploded_tokens(_corpus(spark, sf_dir))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def prefix_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-2-chars prefix -> count (PrefixCount.java:43-57)."""
    from ..functions.text import exploded_tokens

    return (
        exploded_tokens(_corpus(spark, sf_dir))
        .select(F.substring("word", 1, 2).alias("prefix"))
        .groupBy("prefix")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(left, right, cnt): sliding-window bigram counts over the corpus."""
    toks = _corpus(spark, sf_dir).select(tokenize("text").alias("toks"))
    bigrams = (
        toks.where(F.size("toks") > 1)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("toks", 1, F.size("toks") - 1).alias("left"),
                    F.slice(F.col("toks"), 2, F.size("toks") - 1).alias("right"),
                )
            ).alias("bg")
        )
        .select(F.col("bg.left").alias("left"), F.col("bg.right").alias("right"))
    )
    return bigrams.groupBy("left", "right").agg(F.count(F.lit(1)).alias("cnt"))


def bigram_stripes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(left_token, stripe): the reference's map-valued 'stripes' layout
    (a2/ComputeBigramRelativeFrequencyStripes.scala:34-58 — word ->
    {coword: count} associative maps, SURVEY §1.1/A5).

    The stripe is rendered as a canonical sorted-key string
    '{"right":cnt,...}' rather than a MapType column: map equality and
    printing are not portable across engines, a deterministic string is —
    so the DuckDB oracle can hash-match it. Built FROM normalized pair
    rows (one groupBy), the direction the survey recommends over
    map-merging aggregation."""
    counts = _bigram_counts(spark, sf_dir)
    entry = lambda s: F.concat(  # noqa: E731
        F.lit('"'), s["right"], F.lit('":'), s["cnt"].cast("string")
    )
    stripe = F.concat(
        F.lit("{"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("right", "cnt"))), entry
            ),
        ),
        F.lit("}"),
    )
    return counts.groupBy(F.col("left").alias("left_token")).agg(
        stripe.alias("stripe")
    )


def pmi_stripes(
    spark: SparkSession, sf_dir: str, min_count: int = MIN_COUNT
) -> DataFrame:
    """(word, stripe): the map-valued stripes layout of the PMI computation
    (a1/StripesPMI.java:44-118, CooccurrenceStripes.java:34-135 — word ->
    {coword: pmi} HMapStIW values, SURVEY §1.1/A5).

    Same serialization convention as bigram_stripes: a canonical
    sorted-key '{"coword":pmi,...}' string the DuckDB oracle can
    hash-match; pmi values render as fixed %.6f of the already-6-decimal
    rounded doubles, so both engines print identical digits. Built FROM
    the normalized pmi_pairs rows (one extra vocabulary-sized groupBy on
    top of the pairs plan) — the reference's map-merging combiner becomes
    an ordinary aggregation, and the early-HAVING undercount of its
    stripes combiner (StripesPMI.java:110, SURVEY §4) is deliberately NOT
    replicated: pairs semantics are authoritative."""
    pairs = pmi_pairs(spark, sf_dir, min_count)
    entry = lambda s: F.concat(  # noqa: E731
        F.lit('"'),
        s["right_token"],
        F.lit('":'),
        F.format_string("%.6f", s["pmi"]),
    )
    stripe = F.concat(
        F.lit("{"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("right_token", "pmi"))),
                entry,
            ),
        ),
        F.lit("}"),
    )
    return pairs.groupBy(F.col("left_token").alias("word")).agg(
        stripe.alias("stripe")
    )


def bigram_relative_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(left, right) -> count(left,right)/count(left,*), plus the '*'
    marginal rows the reference emits (raw marginal count in rel_freq).

    Reference ...Pairs.scala:55-95 generates sliding-window bigrams plus
    explicit (left,'*') marginal rows, then relies on a left-hash partitioner
    + in-partition sort so each marginal precedes its group. Here the
    marginal is a window sum over the aggregated bigram counts — one
    groupBy shuffle + one window (same key, AQE reuses the partitioning).
    """
    counts = _bigram_counts(spark, sf_dir)
    from pyspark.sql.window import Window

    w = Window.partitionBy("left")
    pairs = counts.withColumn("marginal", F.sum("cnt").over(w)).select(
        F.col("left").alias("left_token"),
        F.col("right").alias("right_token"),
        floor_round(F.col("cnt") / F.col("marginal"), 6).alias("rel_freq"),
    )
    marginals = (
        counts.groupBy("left")
        .agg(F.sum("cnt").alias("marginal"))
        .select(
            F.col("left").alias("left_token"),
            F.lit("*").alias("right_token"),
            F.round(F.col("marginal").cast("double"), 6).alias("rel_freq"),
        )
    )
    return pairs.unionAll(marginals)


def _pmi_tokens_from(corpus: DataFrame) -> DataFrame:
    """Per-line distinct tokens after the 100-token cap (PairsPMI.java:53-66)."""
    return corpus.select(
        "doc_id",
        F.array_distinct(F.slice(tokenize("text"), 1, PMI_TOKEN_CAP)).alias("toks"),
    ).where(F.size("toks") > 0)


def _pmi_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pmi_tokens_from(_corpus(spark, sf_dir))


def pmi_word_line_counts_from(
    corpus: DataFrame, min_count: int = MIN_COUNT
) -> DataFrame:
    """Word -> number of lines containing it, HAVING >= threshold
    (PairsPMI job 1, reducer :97-113)."""
    return (
        _pmi_tokens_from(corpus)
        .select(F.explode("toks").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("line_count"))
        .where(F.col("line_count") >= min_count)
    )


def pmi_word_line_counts(
    spark: SparkSession, sf_dir: str, min_count: int = MIN_COUNT
) -> DataFrame:
    return pmi_word_line_counts_from(_corpus(spark, sf_dir), min_count)


def pmi_pairs_from(corpus: DataFrame, min_count: int = MIN_COUNT) -> DataFrame:
    """Ordered co-occurring word pairs with PMI (CooccurrencePairs.java:57-67
    mapper, :120-135 reducer), over any (doc_id, text) corpus — the
    fixture-independent core pmi_pairs wraps, also exercised by the
    golden-semantics corpus test (tests/test_pmi_golden.py).

    pmi(x,y) = log10( (c(x,y) / (c(x)*c(y))) * N ), pairs with c >= 10,
    where c(w) counts lines containing w and N counts non-empty lines.
    Both orders are emitted, exactly like the reference mapper.

    Scale: pair counts shuffle once on (left,right); the word-count side is
    vocabulary-sized, so both lookup joins broadcast. N is a 1-row aggregate
    collected to the driver (a scalar, never data-sized).
    """
    toks = _pmi_tokens_from(corpus).cache()
    n_lines = toks.count()

    exploded_a = toks.select("doc_id", "toks", F.explode("toks").alias("left"))
    pairs = exploded_a.select(
        "left", F.explode("toks").alias("right")
    ).where(F.col("left") != F.col("right"))
    pair_counts = (
        pairs.groupBy("left", "right")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= min_count)
    )

    wc = pmi_word_line_counts_from(corpus, min_count=min_count)
    left_wc = wc.select(F.col("word").alias("left"), F.col("line_count").alias("px"))
    right_wc = wc.select(F.col("word").alias("right"), F.col("line_count").alias("py"))

    return (
        pair_counts.join(F.broadcast(left_wc), "left")
        .join(F.broadcast(right_wc), "right")
        .select(
            F.col("left").alias("left_token"),
            F.col("right").alias("right_token"),
            F.round(
                F.log10(
                    F.col("pair_count") / (F.col("px") * F.col("py")) * F.lit(n_lines)
                ),
                6,
            ).alias("pmi"),
        )
    )


def pmi_pairs(
    spark: SparkSession, sf_dir: str, min_count: int = MIN_COUNT
) -> DataFrame:
    return pmi_pairs_from(_corpus(spark, sf_dir), min_count)


LM_K = 0.5  # add-k smoothing mass


def bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bigrams, avg_nll): corpus-trained bigram language model
    scored back over every document — the KenLM/CCNet-style perplexity
    quality signal an LLM pipeline thresholds on (gibberish and boilerplate
    score high, fluent in-domain text low). avg_nll = mean -log10 of
    P(right|left) = (c(l,r) + k) / (c(l,_) + k*V), add-k smoothed so
    unseen bigrams stay finite; docs need >= 2 tokens to score.

    Shape: the model IS two aggregates of the corpus (bigram counts +
    left marginals) joined back onto the per-doc bigram stream — counts
    are vocabulary^2-sized at worst, so the joins are ordinary shuffles
    (broadcast when the vocabulary is small); V is one scalar. Training
    and scoring stay one declarative plan; nothing data-sized touches the
    driver.
    """
    from pyspark.sql.window import Window

    # left-marginal as a window sum attached to the counts rows: ONE
    # computation of the tokenize/explode/groupBy subtree + one narrow
    # shuffle by left — a separate marginal aggregate would make the final
    # plan evaluate the counts subtree twice (Catalyst does not share
    # common subtrees across joins)
    counts = _bigram_counts(spark, sf_dir).withColumn(
        "lcnt", F.sum("cnt").over(Window.partitionBy("left"))
    )
    from ..functions.text import exploded_tokens

    vocab = (
        exploded_tokens(_corpus(spark, sf_dir))
        .agg(F.countDistinct("word"))
        .collect()[0][0]
    )  # model-sized scalar (vocabulary cardinality)

    toks = _corpus(spark, sf_dir).select(
        "doc_id", tokenize("text").alias("toks")
    )
    doc_bigrams = (
        toks.where(F.size("toks") > 1)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("toks", 1, F.size("toks") - 1).alias("left"),
                    F.slice(F.col("toks"), 2, F.size("toks") - 1).alias("right"),
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.left").alias("left"), F.col("bg.right").alias("right"))
    )
    p = (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(LM_K)) / (
        F.coalesce(F.col("lcnt"), F.lit(0)) + F.lit(LM_K) * F.lit(float(vocab))
    )
    return (
        doc_bigrams.join(counts, ["left", "right"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(-F.log10(p)), 6).alias("avg_nll"),
        )
    )


# Bump on ANY change to the LM or its scoring (tokenizer, smoothing,
# the avg_nll rounding) — the DEDUP_INDEX_VERSION discipline;
# tests/test_ccnet.py::test_standing_lm_scores_match_inline re-derives
# the inline lineage against the asset so a missed bump still fails CI
# on the test fixtures.
LM_SCORES_VERSION = 1


def lm_scores_path(sf_dir: str) -> str:
    """Deterministic standing LM-score-table location for one data
    generation, keyed on the documents parquet's (size, mtime_ns), the
    smoothing mass and LM_SCORES_VERSION — fixture regeneration or a
    model change can never serve stale scores."""
    import os

    from .vector_index import INDEX_ROOT

    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    sig = f"{st.st_size}_{st.st_mtime_ns}"
    label = os.path.basename(os.path.normpath(sf_dir))
    kpm = round(LM_K * 1000)
    return os.path.join(
        INDEX_ROOT,
        f"lmscores_v{LM_SCORES_VERSION}_{label}_{sig}_k{kpm}",
    )


def standing_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bigram_lm_perplexity's per-doc score table (doc_id, n_bigrams,
    avg_nll) served as a STANDING asset — the maintained perplexity
    metadata column a CCNet-style pipeline ships with its corpus, built
    once per data generation (one LM train + score pass) and probed as
    a parquet scan by every downstream quality card
    (ccnet_perplexity_buckets and the tercile/source/agreement cards on
    top of it). The registered bigram_lm_perplexity card stays the
    inline bootstrap — the same builder-vs-consumer split as
    standing_full_clusters / standing_packed_corpus. Values are
    bit-identical (avg_nll is rounded 6dp before persisting; parquet
    round-trips the double exactly); the DuckDB oracles replay the
    inline chain, unchanged."""
    import os
    import shutil
    import uuid

    from .dedup import _publish_subdir

    path = lm_scores_path(sf_dir)
    sub = os.path.join(path, "scores")
    if not os.path.exists(os.path.join(sub, "_SUCCESS")):
        os.makedirs(path, exist_ok=True)
        tmp = os.path.join(
            path, f"scores.build-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        )
        bigram_lm_perplexity(spark, sf_dir).write.mode("overwrite").parquet(tmp)
        _publish_subdir(tmp, sub)
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(sub)


TOP_TERMS_K = 10


def top_terms_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, rank, token, n): the TOP_TERMS_K most frequent tokens per
    language — grouped top-k where the GROUP count is tiny but each
    group's candidate set is vocabulary-sized, exactly the shape where a
    window partitioned by lang concentrates the whole vocabulary into a
    handful of tasks. Scale fix: ONE global distsort row number over the
    total order (lang, n desc, token) plus a broadcast per-lang offset
    join converts the global rank into the within-lang rank — the same
    offset trick as source_quality_percentiles, applied to top-k. Task
    size is bounded by the range partitioner at any vocabulary size."""
    from ..functions.text import tokenize
    from ..sources.tables import load
    from .distsort import with_running_totals

    docs = load(spark, sf_dir, "documents", parallelize=True).select(
        "lang", tokenize("text").alias("toks")
    )
    counts = (
        docs.select("lang", F.explode("toks").alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ranked = with_running_totals(
        counts,
        [F.asc("lang"), F.desc("n"), F.asc("token")],
        sums={},
        row_col="grn",
    )
    offsets = ranked.groupBy("lang").agg(F.min("grn").alias("first_rn"))
    return (
        ranked.join(F.broadcast(offsets), "lang")
        .select(
            "lang",
            (F.col("grn") - F.col("first_rn") + 1).cast("int").alias("rank"),
            "token",
            "n",
        )
        .where(F.col("rank") <= TOP_TERMS_K)
    )
