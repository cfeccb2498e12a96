"""tokenizer_fertility (per-language BPE fertility / compression card)
vs its REGISTERED DuckDB oracle (catalog.py composes it from the
bpe_encode_stats twin — single-sourced since the round-14 rotation)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.bpe import (
    bpe_encode_stats,
    tokenizer_fertility,
)

from .oracle import assert_matches_oracle


def fertility_oracle_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["tokenizer_fertility"]


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        tokenizer_fertility(spark, sf_correct),
        fertility_oracle_sql(),
        sf_correct,
    )


def test_reconciles_with_per_doc_card(spark, sf_correct):
    """The per-language totals must be exactly the per-doc card's
    column sums — the card is an aggregation, never a recomputation."""
    per_doc = bpe_encode_stats(spark, sf_correct)
    totals = {
        c: sum(r[c] for r in per_doc.select(c).collect())
        for c in ("n_words", "n_subwords", "n_chars")
    }
    fert = tokenizer_fertility(spark, sf_correct).collect()
    for c in totals:
        assert sum(r[c] for r in fert) == totals[c]
    # integer-exact rate replay on one language row
    r = max(fert, key=lambda x: x.n_words)
    assert r.fertility_micro == (r.n_subwords * 1_000_000 + r.n_words // 2) // max(
        r.n_words, 1
    )


def test_nonempty_and_sane_ranges(spark, sf_correct):
    rows = tokenizer_fertility(spark, sf_correct).collect()
    assert len(rows) > 1  # multilingual fixture
    for r in rows:
        # a subword never exceeds its word: fertility >= 1 where words exist
        if r.n_words:
            assert r.fertility_micro >= 1_000_000
            # chars per subword is at least 1 for nonempty tokens
            assert r.chars_per_subword_micro >= 1_000_000
