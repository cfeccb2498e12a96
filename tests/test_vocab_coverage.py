"""bpe_vocab_coverage (capped-vocabulary coverage card, the UNK-fallback
sizing decision) vs an inline DuckDB oracle composed from the registered
_bpe_with merge replay, plus a pure-Python replay (oracle single-sourced in
plans/catalog.py since round-10 registration; ITERATIVE — runs the BPE trainer
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
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["bpe_vocab_coverage"]


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
