"""embedding_dedup_recall (exact-vs-scoped pair-set recall card for the
round-9 scoped default of embedding_near_duplicates) vs an inline DuckDB
oracle composed from the catalog scope fragments, plus set-algebra
invariants (staged for round-10 registration per the window contract)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.similarity import (
    RECALL_AUDIT_THRESHOLD,
    cosine_near_duplicate_pairs,
    embedding_dedup_recall,
    embedding_near_duplicates_scoped,
)

from .oracle import assert_matches_oracle


def _recall_sql() -> str:
    from bigdata_infra_cs489_spark.plans.catalog import (
        _EMB_SCOPE_CTES,
        DUCK_EMB,
    )

    t = RECALL_AUDIT_THRESHOLD
    return f"""
    WITH e AS ({DUCK_EMB}),{_EMB_SCOPE_CTES},
    ex AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                  round(list_cosine_similarity(a.v, b.v), 6) AS cosine
           FROM e a JOIN e b ON a.vec_id < b.vec_id
           WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {t}),
    sc AS (SELECT ex.vec_a, ex.vec_b FROM ex
           JOIN best ba ON ba.vec_id = ex.vec_a
           JOIN best bb ON bb.vec_id = ex.vec_b
           WHERE ba.centroid_id = bb.centroid_id),
    mis AS (SELECT ex.cosine FROM ex
            LEFT JOIN sc ON sc.vec_a = ex.vec_a AND sc.vec_b = ex.vec_b
            WHERE sc.vec_a IS NULL),
    tot AS (SELECT CAST((SELECT count(*) FROM ex) AS BIGINT) AS n_exact_pairs,
                   CAST((SELECT count(*) FROM sc) AS BIGINT) AS n_scoped_pairs,
                   CAST((SELECT count(*) FROM mis) AS BIGINT) AS missed_pairs,
                   round(coalesce((SELECT max(cosine) FROM mis), 0.0), 6)
                       AS max_missed_cosine)
    SELECT n_exact_pairs, n_scoped_pairs, missed_pairs,
           CAST((n_scoped_pairs * 1000000 + n_exact_pairs // 2)
                // greatest(n_exact_pairs, 1) AS BIGINT) AS recall_ppm,
           max_missed_cosine
    FROM tot
    """


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
