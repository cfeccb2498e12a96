"""bpe_vocab_coverage (capped-vocabulary coverage card, the UNK-fallback
sizing decision) vs an inline DuckDB oracle composed from the registered
_bpe_with merge replay, plus a pure-Python replay (staged for round-10
registration per the window contract; ITERATIVE — runs the BPE trainer
loop, the bpe_merges plan-audit exclusion rationale)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.bpe import (
    BPE_VOCAB_CAP,
    N_MERGES,
    bpe_vocab_coverage,
    train_bpe,
)

from .oracle import assert_matches_oracle


def _coverage_sql() -> str:
    from bigdata_infra_cs489_spark.plans.catalog import _bpe_with

    n = N_MERGES
    return (
        _bpe_with(n)
        + f""",
    tok AS (SELECT s AS token, CAST(sum(cnt) AS BIGINT) AS n
            FROM (SELECT cnt, unnest(syms) AS s FROM bpe_w{n}) GROUP BY 1),
    topv AS (SELECT token FROM tok ORDER BY n DESC, token
             LIMIT {BPE_VOCAB_CAP}),
    sub AS (SELECT CAST(sum(n) AS BIGINT) AS total_subword_occ,
                   CAST(coalesce(sum(CASE WHEN token IN
                                     (SELECT token FROM topv) THEN n END), 0)
                        AS BIGINT) AS covered_subword_occ
            FROM tok),
    tv AS (SELECT list(token) AS toklist FROM topv),
    words AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_word_occ,
                     CAST(coalesce(sum(CASE WHEN list_has_all(
                                 tv.toklist, syms)
                              THEN cnt END), 0) AS BIGINT)
                         AS fully_covered_word_occ
              FROM bpe_w{n}, tv)
    SELECT CAST({BPE_VOCAB_CAP} AS INT) AS vocab_cap,
           sub.total_subword_occ, sub.covered_subword_occ,
           CAST((sub.covered_subword_occ * 1000000
                 + sub.total_subword_occ // 2)
                // greatest(sub.total_subword_occ, 1) AS BIGINT)
               AS coverage_ppm,
           words.total_word_occ, words.fully_covered_word_occ,
           CAST((words.fully_covered_word_occ * 1000000
                 + words.total_word_occ // 2)
                // greatest(words.total_word_occ, 1) AS BIGINT)
               AS word_coverage_ppm
    FROM sub, words
    """
    )


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        bpe_vocab_coverage(spark, sf_correct), _coverage_sql(), sf_correct
    )


def test_matches_python_replay_and_has_oov(spark, sf_correct):
    """Pure-Python replay over the trained segmentation: top-cap set by
    (count desc, token asc), both coverage legs as exact sums. The cap
    must actually exclude tokens on the fixture (a full-coverage card is
    vacuous), and both coverage rates must be strictly between 0 and 1e6."""
    from collections import Counter

    _, vocab = train_bpe(spark, sf_correct)
    rows = vocab.collect()
    occ: Counter = Counter()
    for r in rows:
        for s in r["syms"]:
            occ[s] += r["cnt"]
    top = set(
        t for t, _ in sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[
            :BPE_VOCAB_CAP
        ]
    )
    assert len(occ) > BPE_VOCAB_CAP, "fixture must have OOV signal"
    total_sub = sum(occ.values())
    covered_sub = sum(n for t, n in occ.items() if t in top)
    total_w = sum(r["cnt"] for r in rows)
    covered_w = sum(r["cnt"] for r in rows if all(s in top for s in r["syms"]))
    card = bpe_vocab_coverage(spark, sf_correct).collect()[0]
    assert card["total_subword_occ"] == total_sub
    assert card["covered_subword_occ"] == covered_sub
    assert card["total_word_occ"] == total_w
    assert card["fully_covered_word_occ"] == covered_w
    assert 0 < card["coverage_ppm"] < 1_000_000
    assert 0 < card["word_coverage_ppm"] < 1_000_000
