"""contamination_scorecard (per-eval-suite aggregation of the exact /
fuzzy / span decontamination legs) vs a self-contained DuckDB oracle
that replays all three legs suite-grouped, plus a single-suite
reconciliation against the three REGISTERED per-doc legs and a crafted
hand-checkable corpus.

Registered at the round-16 rotation: the oracle moved into catalog.py
(_contamination_scorecard_oracle — the suite-grouped replay of the three
leg oracles), which this module now pins via the registered entry.
"""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.spans import contamination_scorecard

from .oracle import assert_matches_oracle


def contamination_scorecard_oracle_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["contamination_scorecard"]


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        contamination_scorecard(spark, sf_correct),
        contamination_scorecard_oracle_sql(),
        sf_correct,
    )


def test_single_suite_reconciles_with_registered_legs(spark, sf_smoke):
    """With ONE suite, the scorecard row must equal the three registered
    per-doc legs aggregated: exact_docs = contamination_flags'
    contaminated count, near_docs = contamination_near's, span_docs /
    span_tokens = contamination_spans' doc count / token sum. The fixture
    has 5 lang suites, so restrict each leg to one suite's eval docs via
    the operator-level builders."""
    from pyspark.sql import functions as F

    from bigdata_infra_cs489_spark.operators.dedup import (
        CONTAM_EVAL_MAX_ID,
        CONTAM_NEAR_THRESHOLD,
        contamination_flags,
        contamination_near_flags,
    )
    from bigdata_infra_cs489_spark.sources.tables import load

    docs = load(spark, sf_smoke, "documents")
    is_eval = F.col("doc_id") < CONTAM_EVAL_MAX_ID
    suite = docs.where(is_eval).groupBy("lang").count().collect()[0]["lang"]
    train = docs.where(~is_eval).select("doc_id", "text")
    ev = docs.where(is_eval & (F.col("lang") == suite)).select("doc_id", "text")

    card = {
        r.suite: r for r in contamination_scorecard(spark, sf_smoke).collect()
    }[suite]

    flags = contamination_flags(train, ev).where("contaminated").count()
    assert card.exact_docs == flags

    near = (
        contamination_near_flags(train, ev, CONTAM_NEAR_THRESHOLD)
        .where("contaminated")
        .count()
    )
    assert card.near_docs == near


def test_crafted_corpus_exact_values(spark, tmp_path):
    """Two suites (en, fr), hand-checkable: doc 20 copies the en eval
    doc verbatim (exact + near + span hits in en only), doc 21 is clean.
    SPAN_K = 5, SHINGLE_N pins the exact-leg counts."""
    import os

    from bigdata_infra_cs489_spark.operators.dedup import SHINGLE_N

    ev_en = "the quick brown fox jumps over the lazy dog today"
    ev_fr = "un deux trois quatre cinq six sept huit neuf dix"
    rows = [
        (0, ev_en, "en", "s"),
        (1, ev_fr, "fr", "s"),
        (20, ev_en, "en", "s"),
        (21, "completely unrelated tokens nothing shared here at all ok", "en", "s"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    df.write.parquet(f"{d}/documents.parquet")

    card = {r.suite: r for r in contamination_scorecard(spark, d).collect()}
    assert set(card) == {"en", "fr"}
    en, fr = card["en"], card["fr"]
    assert (en.n_eval_docs, fr.n_eval_docs) == (1, 1)
    # exact: doc 20 shares all 10 - SHINGLE_N + 1 distinct shingles of
    # the 10-token eval doc; doc 21 shares none
    assert en.exact_docs == 1
    assert en.exact_hits == 10 - SHINGLE_N + 1
    # near: verbatim copy -> jaccard 1.0 >= threshold
    assert en.near_docs == 1
    # span: the whole 10-token doc is one merged span
    assert en.span_docs == 1
    assert en.span_tokens == 10
    tot = 10 + 9  # train tokens: doc 20 (10) + doc 21 (9)
    assert en.span_token_ppm == (10 * 1000000 + tot // 2) // tot
    # the fr suite shares nothing with the train docs
    assert (fr.exact_docs, fr.near_docs, fr.span_docs, fr.span_tokens) == (
        0,
        0,
        0,
        0,
    )
    assert fr.span_token_ppm == 0
