"""embedding_dedup_recall (exact-vs-scoped pair-set recall card for the
round-9 scoped default of embedding_near_duplicates) vs an inline DuckDB
oracle composed from the catalog scope fragments, plus set-algebra
invariants (oracle single-sourced in plans/catalog.py since round-10 registration)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.similarity import (
    RECALL_AUDIT_THRESHOLD,
    cosine_near_duplicate_pairs,
    embedding_dedup_recall,
    embedding_near_duplicates_scoped,
)

from .oracle import assert_matches_oracle


def _recall_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["embedding_dedup_recall"]


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        embedding_dedup_recall(spark, sf_correct), _recall_sql(), sf_correct
    )


def test_scoped_is_subset_and_card_consistent(spark, sf_correct):
    """The scoped pair set is a strict subset relation: every scoped pair
    is an exact pair at the same threshold (the scope only restricts
    candidates); the card's counts telescope; the fixture must carry
    real pair signal at the audit threshold or the card is vacuous."""
    t = RECALL_AUDIT_THRESHOLD
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_near_duplicate_pairs(spark, sf_correct, threshold=t).collect()
    }
    scoped = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_duplicates_scoped(
            spark, sf_correct, threshold=t
        ).collect()
    }
    assert scoped <= exact
    card = embedding_dedup_recall(spark, sf_correct).collect()[0]
    assert card["n_exact_pairs"] == len(exact) > 0
    assert card["n_scoped_pairs"] == len(scoped)
    assert card["missed_pairs"] == len(exact) - len(scoped)
    assert 0 < card["recall_ppm"] <= 1_000_000
    if card["missed_pairs"] == 0:
        assert card["max_missed_cosine"] == 0.0
    else:
        assert card["max_missed_cosine"] >= t
