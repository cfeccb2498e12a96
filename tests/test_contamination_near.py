"""Fuzzy benchmark decontamination vs an inline DuckDB oracle (banded
MinHash candidates + exact-Jaccard verify, train-vs-eval asymmetric) and
cross-operator consistency invariants (staged for round-8 registration
per the window contract)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.dedup import (
    CONTAM_EVAL_MAX_ID,
    CONTAM_NEAR_THRESHOLD,
    q_contamination_flags,
    q_contamination_near,
)

from .oracle import assert_matches_oracle


def _near_sql() -> str:
    from bigdata_infra_cs489_spark.operators import dedup as D
    from bigdata_infra_cs489_spark.plans.catalog import (
        DUCK_MINHASH_SIG,
        DUCK_SHINGLES,
    )

    rows = D.NUM_HASHES // D.NUM_BANDS
    return f"""
    WITH {DUCK_SHINGLES},
    sigs AS (SELECT doc_id, {DUCK_MINHASH_SIG} AS sig FROM sh),
    bands AS (
        SELECT doc_id, b,
               array_to_string(list_transform(
                   sig[b*{rows}+1 : b*{rows}+{rows}],
                   v -> v::VARCHAR), ':') AS band_key
        FROM sigs, unnest(range(0, {D.NUM_BANDS})) t(b)),
    cand AS (
        SELECT DISTINCT c.doc_id, e.doc_id AS eval_id
        FROM bands c JOIN bands e ON c.b = e.b AND c.band_key = e.band_key
        WHERE c.doc_id >= {CONTAM_EVAL_MAX_ID}
          AND e.doc_id < {CONTAM_EVAL_MAX_ID}),
    ver AS (
        SELECT cand.doc_id, cand.eval_id,
               round(len(list_intersect(sa.sh, sb.sh)) /
                     len(list_distinct(list_concat(sa.sh, sb.sh))), 6)
                   AS jaccard
        FROM cand
        JOIN sh sa ON sa.doc_id = cand.doc_id
        JOIN sh sb ON sb.doc_id = cand.eval_id),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY jaccard DESC, eval_id ASC) AS rn,
               count(*) OVER (PARTITION BY doc_id) AS n_candidates
        FROM ver),
    best AS (SELECT doc_id, n_candidates, eval_id AS best_eval_id,
                    jaccard AS best_jaccard
             FROM ranked WHERE rn = 1)
    SELECT d.doc_id,
           CAST(coalesce(b.n_candidates, 0) AS BIGINT) AS n_candidates,
           CAST(coalesce(b.best_eval_id, -1) AS BIGINT) AS best_eval_id,
           coalesce(b.best_jaccard, 0.0) AS best_jaccard,
           coalesce(b.best_jaccard, 0.0) >= {CONTAM_NEAR_THRESHOLD}
               AS contaminated
    FROM (SELECT doc_id FROM documents
          WHERE doc_id >= {CONTAM_EVAL_MAX_ID}) d
    LEFT JOIN best b USING (doc_id)
    """


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        q_contamination_near(spark, sf_correct), _near_sql(), sf_correct
    )


def test_fixture_has_signal(spark, sf_correct):
    """The sf0.01 fixture must contain at least one near-contaminated
    train doc, or the oracle assertion above only ever exercises the
    all-clean path."""
    rows = q_contamination_near(spark, sf_correct).where("contaminated").collect()
    assert len(rows) >= 1
    for r in rows:
        assert 0 <= r["best_eval_id"] < CONTAM_EVAL_MAX_ID
        assert r["best_jaccard"] >= CONTAM_NEAR_THRESHOLD
        assert r["n_candidates"] >= 1


def test_consistent_with_exact_flags(spark, sf_smoke):
    """Cross-operator invariants on the smoke corpus: a doc with any
    verified candidate shares a shingle with the eval set, so its exact
    contamination_flags row must show n_hits > 0; docs with no candidates
    report the (-1, 0.0, false) degrade tuple."""
    near = {r["doc_id"]: r for r in q_contamination_near(spark, sf_smoke).collect()}
    exact = {
        r["doc_id"]: r["n_hits"]
        for r in q_contamination_flags(spark, sf_smoke).collect()
    }
    assert set(near) == set(exact)
    for d, r in near.items():
        if r["n_candidates"] > 0 and r["best_jaccard"] > 0:
            assert exact[d] > 0, d
        if r["n_candidates"] == 0:
            assert (r["best_eval_id"], r["best_jaccard"], r["contaminated"]) == (
                -1,
                0.0,
                False,
            ), d
