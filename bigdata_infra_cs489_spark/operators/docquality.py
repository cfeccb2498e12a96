"""Gopher-style document quality rules (Rae et al. 2021, "Scaling
Language Models: ... Gopher", Appendix A1.1).

The heuristic quality gate LLM pipelines run before model-based
filtering: per-document word-count bounds, mean-word-length bounds,
symbol-to-word ratio, bullet/ellipsis line fractions, alphabetic-word
fraction, and a minimum stop-word hit count. No reference counterpart
(north-star extension family, the curation shelf next to text_quality
and clean_corpus).

Scale/determinism design:
- one narrow projection over the text scan; every metric is a codegen'd
  or higher-order array expression (no Python, no shuffle, no window) —
  the whole gate is embarrassingly parallel at any corpus size;
- every FLAG is exact INTEGER arithmetic (cross-multiplication instead
  of float division: ``10*n_symbols <= n_words`` rather than
  ``n_symbols/n_words <= 0.1``), so a flag can never flip on a last-ulp
  float disagreement between engines — the only float in the output is
  the 6dp display ratio, a single division of identical int64 pairs;
- word = raw whitespace-split token (Java's \\s class spelled out, the
  repo tokenizer's split — see functions/text.py TOKEN_SPLIT_RE for why
  \\x0B is explicit); line = chr(10) split with trailing empties kept on
  both engines.

Zero-word documents pass the length-shape flags vacuously (0 <= 0) and
fail flag_word_count, so gopher_pass is still False.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import TOKEN_SPLIT_RE
from ..sources.tables import load

# Appendix A1.1's "required words" list.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_STOPWORDS = 2


def gopher_metrics(docs: DataFrame) -> DataFrame:
    """(doc_id, integer rule inputs, 6dp mean_word_len, 7 rule flags,
    gopher_pass) for every document."""
    words = F.filter(
        F.split(F.col("text"), TOKEN_SPLIT_RE), lambda t: F.length(t) > 0
    )
    lines = F.split(F.col("text"), "\n")

    base = docs.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.aggregate(
            words, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
        ).alias("word_chars"),
        F.size(F.filter(words, lambda t: t.rlike("[A-Za-z]")))
        .cast("bigint")
        .alias("n_alpha_words"),
        sum(
            F.array_contains(F.transform(words, F.lower), s).cast("bigint")
            for s in GOPHER_STOPWORDS
        ).alias("n_stopword_hits"),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(F.filter(lines, lambda l: l.rlike("^ *[-*]")))
        .cast("bigint")
        .alias("n_bullet_lines"),
        F.size(F.filter(lines, lambda l: l.rlike("\\.\\.\\.$")))
        .cast("bigint")
        .alias("n_ellipsis_lines"),
        F.regexp_count("text", F.lit("#|\\.\\.\\.")).cast("bigint").alias("n_symbols"),
    )

    nw = F.col("n_words")
    flags = base.select(
        "*",
        F.round(F.col("word_chars") / F.greatest(nw, F.lit(1)), 6).alias(
            "mean_word_len"
        ),
        nw.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS).alias("flag_word_count"),
        (
            (F.col("word_chars") >= 3 * nw) & (F.col("word_chars") <= 10 * nw)
        ).alias("flag_mean_word_len"),
        (10 * F.col("n_symbols") <= nw).alias("flag_symbol_ratio"),
        (10 * F.col("n_bullet_lines") <= 9 * F.col("n_lines")).alias("flag_bullet"),
        (10 * F.col("n_ellipsis_lines") <= 3 * F.col("n_lines")).alias(
            "flag_ellipsis"
        ),
        (5 * F.col("n_alpha_words") >= 4 * nw).alias("flag_alpha"),
        (F.col("n_stopword_hits") >= GOPHER_MIN_STOPWORDS).alias("flag_stopwords"),
    )
    return flags.withColumn(
        "gopher_pass",
        F.col("flag_word_count")
        & F.col("flag_mean_word_len")
        & F.col("flag_symbol_ratio")
        & F.col("flag_bullet")
        & F.col("flag_ellipsis")
        & F.col("flag_alpha")
        & F.col("flag_stopwords"),
    )


def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract query: the full rule table over documents."""
    return gopher_metrics(load(spark, sf_dir, "documents"))


def gopher_pass_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rule, n_fail, fail_ppm): corpus failure rate per rule — the
    report a pipeline owner reads to tune thresholds before gating.
    One partial-aggregated pass; #rules rows of driver state."""
    return gopher_rate_report(gopher_metrics(load(spark, sf_dir, "documents")))


def gopher_rate_report(m: DataFrame) -> DataFrame:
    """The report aggregation over an already-computed metrics frame."""
    # count(*) + coalesced sums + greatest(n_docs, 1): a zero-document
    # corpus degrades to 8 rows of n_fail=0 / fail_ppm=0 instead of NULLs
    # (sum over zero rows is NULL, and x div NULL is NULL) — the
    # degrade-to-zero contract the sibling report operators follow.
    n_docs = F.count(F.lit(1))
    aggs = [
        F.coalesce(F.sum((~F.col(c)).cast("bigint")), F.lit(0)).alias(
            c.removeprefix("flag_")
        )
        for c in (
            "flag_word_count",
            "flag_mean_word_len",
            "flag_symbol_ratio",
            "flag_bullet",
            "flag_ellipsis",
            "flag_alpha",
            "flag_stopwords",
        )
    ] + [
        F.coalesce(F.sum((~F.col("gopher_pass")).cast("bigint")), F.lit(0)).alias(
            "gopher_pass"
        )
    ]
    wide = m.agg(n_docs.cast("bigint").alias("n_docs"), *aggs)
    names = [
        "word_count",
        "mean_word_len",
        "symbol_ratio",
        "bullet",
        "ellipsis",
        "alpha",
        "stopwords",
        "gopher_pass",
    ]
    tall = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("rule"),
                        F.col(n).alias("n_fail"),
                        F.col("n_docs").alias("n_docs"),
                    )
                    for n in names
                ]
            )
        ).alias("r")
    )
    return tall.select(
        F.col("r.rule").alias("rule"),
        F.col("r.n_fail").alias("n_fail"),
        # exact integer ppm via (f*1e6 + d div 2) div d: rounded division
        # with NO float step anywhere (a double division + floor could
        # flip at a representation boundary), so the twin can never
        # diverge
        F.expr(
            "(r.n_fail * 1000000L + r.n_docs div 2) div greatest(r.n_docs, 1L)"
        )
        .cast("bigint")
        .alias("fail_ppm"),
    )
