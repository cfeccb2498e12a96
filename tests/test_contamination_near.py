"""Fuzzy benchmark decontamination vs the registered DuckDB oracle
(single-sourced in plans/catalog.py since round-8 registration: banded
MinHash candidates + exact-Jaccard verify, train-vs-eval asymmetric) and
cross-operator consistency invariants."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.dedup import (
    CONTAM_EVAL_MAX_ID,
    CONTAM_NEAR_THRESHOLD,
    q_contamination_flags,
    q_contamination_near,
)

from .oracle import assert_matches_oracle


def test_matches_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    assert_matches_oracle(
        q_contamination_near(spark, sf_correct),
        entrymod.oracle_sql()["contamination_near"],
        sf_correct,
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
