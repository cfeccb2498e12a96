"""Gopher quality rules vs the registered DuckDB oracle (single-sourced
in plans/catalog.py since round-7 registration) AND a pure-Python
reimplementation on crafted multi-line documents (the fixture corpus is
single-line word soup, so line-shape rules get their real exercise from
the crafted set)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from bigdata_infra_cs489_spark.operators.docquality import (
    GOPHER_MAX_WORDS,
    GOPHER_MIN_STOPWORDS,
    GOPHER_MIN_WORDS,
    GOPHER_STOPWORDS,
    gopher_metrics,
    gopher_pass_rates,
    gopher_quality_flags,
)

from .oracle import assert_matches_oracle

_RULES = (
    "word_count",
    "mean_word_len",
    "symbol_ratio",
    "bullet",
    "ellipsis",
    "alpha",
    "stopwords",
    "gopher_pass",
)


def test_flags_match_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    assert_matches_oracle(
        gopher_quality_flags(spark, sf_correct),
        entrymod.oracle_sql()["gopher_quality_flags"],
        sf_correct,
    )


def test_rates_match_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    assert_matches_oracle(
        gopher_pass_rates(spark, sf_correct),
        entrymod.oracle_sql()["gopher_pass_rates"],
        sf_correct,
    )


# --- crafted multi-line corpus vs a pure-Python reimplementation ------------

_CRAFTED = [
    (0, ""),  # empty: vacuous length flags, fails word count
    (1, "the cat sat on the mat and that is all we have to say with it"),
    (2, "- first\n- second\n* third\n  - indented\nplain line"),
    (3, "to be continued...\nand then...\nmore...\nplain\nalso plain"),
    (4, "### heading # with #### symbols and dots .... here"),
    (5, "a b c d e f g h i j"),  # 1-char words: mean length < 3
    (6, "supercalifragilistic antidisestablishmentarianism " * 5),
    (7, "12 34 56 78 90 11 22 33 44 55"),  # no alphabetic words
    (
        8,
        " ".join(
            ["the quick brown fox jumps over that lazy dog with glee and"] * 6
        ),  # 66 words incl. stopwords: should pass everything
    ),
    (9, "word\n\n\nword\n"),  # empty lines kept by both engines
    (10, "- alpha\n- beta\n* gamma"),  # 100% bullet lines: fails flag_bullet
]


def _py_metrics(doc_id: int, text: str) -> dict:
    words = [w for w in re.split("[ \t\n\x0b\f\r]+", text) if w]
    lines = text.split("\n")
    n_words = len(words)
    word_chars = sum(len(w) for w in words)
    n_alpha = sum(1 for w in words if re.search("[A-Za-z]", w))
    lowered = {w.lower() for w in words}
    n_stop = sum(1 for s in GOPHER_STOPWORDS if s in lowered)
    n_bullet = sum(1 for l in lines if re.search(r"^ *[-*]", l))
    n_ellipsis = sum(1 for l in lines if re.search(r"\.\.\.$", l))
    n_symbols = len(re.findall(r"#|\.\.\.", text))
    return {
        "doc_id": doc_id,
        "n_words": n_words,
        "word_chars": word_chars,
        "n_alpha_words": n_alpha,
        "n_stopword_hits": n_stop,
        "n_lines": len(lines),
        "n_bullet_lines": n_bullet,
        "n_ellipsis_lines": n_ellipsis,
        "n_symbols": n_symbols,
        "flag_word_count": GOPHER_MIN_WORDS <= n_words <= GOPHER_MAX_WORDS,
        "flag_mean_word_len": 3 * n_words <= word_chars <= 10 * n_words,
        "flag_symbol_ratio": 10 * n_symbols <= n_words,
        "flag_bullet": 10 * n_bullet <= 9 * len(lines),
        "flag_ellipsis": 10 * n_ellipsis <= 3 * len(lines),
        "flag_alpha": 5 * n_alpha >= 4 * n_words,
        "flag_stopwords": n_stop >= GOPHER_MIN_STOPWORDS,
    }


def test_crafted_corpus_matches_python(spark):
    df = spark.createDataFrame(_CRAFTED, "doc_id bigint, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_metrics(df).collect()}
    assert set(got) == {d for d, _ in _CRAFTED}
    for doc_id, text in _CRAFTED:
        want = _py_metrics(doc_id, text)
        want["gopher_pass"] = all(v for k, v in want.items() if k.startswith("flag_"))
        g = got[doc_id]
        for k, v in want.items():
            assert g[k] == v, (doc_id, k, g[k], v)


def test_crafted_corpus_rule_exercise():
    """The crafted set must actually exercise each rule in both
    directions, or the cross-engine assertions above prove nothing."""
    ms = [_py_metrics(d, t) for d, t in _CRAFTED]
    for flag in [k for k in ms[0] if k.startswith("flag_")]:
        vals = {m[flag] for m in ms}
        assert vals == {True, False}, f"{flag} never varies across crafted docs"


def test_doc8_passes_everything(spark):
    df = spark.createDataFrame(_CRAFTED, "doc_id bigint, text string")
    row = gopher_metrics(df).where(F.col("doc_id") == 8).collect()[0]
    assert row["gopher_pass"] is True


def test_rates_empty_corpus_degrades_to_zero(spark):
    """Degrade-to-zero contract (round-7 ADVICE follow-up): a corpus with
    zero documents yields the full 8-rule report with n_fail=0 and
    fail_ppm=0, never NULLs (sum over zero rows is NULL, x div NULL is
    NULL without the coalesce/greatest guards)."""
    from bigdata_infra_cs489_spark.operators.docquality import gopher_rate_report

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    rows = gopher_rate_report(gopher_metrics(empty)).collect()
    assert sorted(r["rule"] for r in rows) == sorted(_RULES)
    for r in rows:
        assert r["n_fail"] == 0, r
        assert r["fail_ppm"] == 0, r
