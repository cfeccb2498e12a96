"""Text-analysis + events analytics vs DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest

from .oracle import assert_matches_oracle

NAMES = [
    "language_id",
    "text_quality",
    "token_counts",
    "doc_fingerprints",
    "repetition_stats",
    "token_budget_pack",
    "sequence_pack",
    "events_tumbling_counts",
    "events_sliding_counts",
    "events_sessionize",
    "events_json_stats",
    "user_funnel",
    "top_users_by_type",
    "events_gap_filled_counts",
]


@pytest.mark.parametrize("name", NAMES)
def test_matches_oracle(spark, sf_correct, name):
    import __spark_entry__ as entrymod

    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    assert_matches_oracle(q(spark, sf_correct), sql, sf_correct)


def test_language_id_positive(spark):
    from bigdata_infra_cs489_spark.operators import textstats

    # the heuristic itself on injected rows: English stopwords -> 'en'
    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat and it is warm"), (1, "xyz qqq zzz")],
        ["doc_id", "text"],
    )
    docs.createOrReplaceTempView("_tmp")
    from pyspark.sql import functions as F

    from bigdata_infra_cs489_spark.functions.text import tokenize

    toks = docs.select("doc_id", tokenize("text").alias("toks"))
    en = textstats.LANG_STOPWORDS["en"]
    hit = toks.select(
        "doc_id", F.size(F.filter("toks", lambda t: t.isin(*en))).alias("hits")
    ).collect()
    hits = {r.doc_id: r.hits for r in hit}
    assert hits[0] >= 4 and hits[1] == 0


def test_sequence_pack_invariants(spark, sf_correct):
    """Packing covers a contiguous token stream: offsets stay inside the
    sequence, every doc starts exactly where the running sum says, and
    seq_ids cover 0..total_tokens//L with no holes."""
    from bigdata_infra_cs489_spark.operators.textstats import SEQ_LEN, sequence_pack

    rows = sequence_pack(spark, sf_correct).collect()
    assert rows
    total = sum(r.n_tokens for r in rows)
    assert all(0 <= r.seq_offset < SEQ_LEN for r in rows)
    assert max(r.seq_id for r in rows) <= total // SEQ_LEN
    # reconstruct: sort by (seq_id, seq_offset) -> running sum matches
    # zero-token docs share a start position with their successor; order
    # them first so the running sum stays exact
    ordered = sorted(
        rows, key=lambda r: (r.seq_id, r.seq_offset, r.n_tokens != 0, r.doc_id)
    )
    cum = 0
    for r in ordered:
        assert r.seq_id * SEQ_LEN + r.seq_offset == cum
        cum += r.n_tokens
    assert cum == total


def test_sessionize_gap_semantics(spark, sf_correct):
    from bigdata_infra_cs489_spark.operators.events import sessionize

    rows = sessionize(spark, sf_correct).collect()
    assert rows
    # session ids are 1..n per user, durations non-negative
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r.session_id)
        assert r.duration_sec >= 0
    for sids in by_user.values():
        assert sorted(sids) == list(range(1, len(sids) + 1))


def test_clean_corpus_matches_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    from .oracle import assert_matches_oracle

    q = entrymod.queries()["clean_corpus"]
    sql = entrymod.oracle_sql()["clean_corpus"]
    assert_matches_oracle(q(spark, sf_correct), sql, sf_correct)


def test_clean_corpus_filters_are_effective(spark, sf_correct):
    from bigdata_infra_cs489_spark.operators.textstats import (
        CLEAN_MAX_TOKENS,
        CLEAN_MIN_QUALITY,
        CLEAN_MIN_TOKENS,
        clean_corpus,
    )
    from bigdata_infra_cs489_spark.sources.tables import load

    rows = clean_corpus(spark, sf_correct).collect()
    n_docs = load(spark, sf_correct, "documents").count()
    assert 0 < len(rows) < n_docs  # gates actually drop documents
    for r in rows:
        assert r["quality_score"] >= CLEAN_MIN_QUALITY
        assert CLEAN_MIN_TOKENS <= r["n_tokens"] <= CLEAN_MAX_TOKENS


def test_repetition_stats_degenerate_docs(spark):
    """Empty doc -> all zeros; single token -> no bigrams; a pure
    repetition doc pins all three fractions."""
    from bigdata_infra_cs489_spark.operators import textstats as TS

    docs = spark.createDataFrame(
        [
            (0, ""),
            (1, "hello"),
            (2, "spam spam spam spam"),
            (3, "a b a b"),
        ],
        ["doc_id", "text"],
    )
    orig = TS.load
    try:
        TS.load = lambda s, d, n, **kw: docs
        got = {r["doc_id"]: r for r in TS.repetition_stats(spark, "unused").collect()}
    finally:
        TS.load = orig
    assert got[0]["n_tokens"] == 0 and got[0]["top_bigram_frac"] == 0.0
    assert got[1]["n_tokens"] == 1 and got[1]["top_bigram_frac"] == 0.0
    assert got[2]["distinct_token_ratio"] == 0.25
    assert got[2]["top_token_frac"] == 1.0
    assert got[2]["top_bigram_frac"] == 1.0  # "spam spam" x3 of 3
    assert got[3]["top_token_frac"] == 0.5
    assert got[3]["top_bigram_frac"] == pytest.approx(2 / 3, abs=1e-6)


def test_behavioral_analytics_match_oracle(spark, sf_smoke):
    import __spark_entry__ as entrymod

    from .oracle import assert_matches_oracle

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in ("session_cooccurrence", "funnel_latency", "daily_value_ewma"):
        assert_matches_oracle(qs[name](spark, sf_smoke), oracles[name], sf_smoke)


def test_cooccurrence_pairs_are_canonical(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.events import session_cooccurrence

    rows = session_cooccurrence(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r.type_a < r.type_b
        assert 0 < r.support_ppm <= 1_000_000
        assert r.lift > 0


def test_funnel_latency_percentile_ordering(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.events import funnel_latency

    [r] = funnel_latency(spark, sf_smoke).collect()
    assert r.n_converted > 0
    assert r.median_signup_to_click_sec <= r.p90_signup_to_click_sec
    assert r.median_click_to_purchase_sec <= r.p90_click_to_purchase_sec


def test_ewma_first_day_equals_itself_and_stays_in_range(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.analytics import daily_value_ewma

    rows = sorted(daily_value_ewma(spark, sf_smoke).collect(), key=lambda r: r.day)
    assert rows[0].ewma == rows[0].sum_value
    lo = min(r.sum_value for r in rows)
    hi = max(r.sum_value for r in rows)
    for r in rows:
        assert lo - 1e-6 <= r.ewma <= hi + 1e-6
