"""Quality-distillation classifier vs the registered DuckDB oracle
(single-sourced in plans/catalog.py since round-8 registration: the
shared recursive-CTE _sgd_with trainer parametrized with the
text_quality-threshold labels), plus learning-signal invariants."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.qualitymodel import (
    quality_model_report,
    quality_model_scores,
    quality_model_weights,
)

from .oracle import assert_matches_oracle


def test_weights_match_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    assert_matches_oracle(
        quality_model_weights(spark, sf_correct),
        entrymod.oracle_sql()["quality_model_weights"],
        sf_correct,
    )


def test_scores_match_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    assert_matches_oracle(
        quality_model_scores(spark, sf_correct),
        entrymod.oracle_sql()["quality_model_scores"],
        sf_correct,
    )


def test_report_matches_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    assert_matches_oracle(
        quality_model_report(spark, sf_correct),
        entrymod.oracle_sql()["quality_model_report"],
        sf_correct,
    )


def test_labels_balanced_and_model_learns(spark, sf_correct):
    """The fixed threshold must actually split the fixture corpus (both
    labels present, neither >90%), and the in-sample model must beat the
    majority-class baseline — otherwise the distillation query verifies
    arithmetic but demonstrates nothing."""
    rep = quality_model_report(spark, sf_correct).collect()[0]
    assert 0 < rep["n_keep_label"] < rep["n_docs"]
    frac_keep = rep["n_keep_label"] / rep["n_docs"]
    assert 0.1 < frac_keep < 0.9, frac_keep
    majority_ppm = round(max(frac_keep, 1 - frac_keep) * 1_000_000)
    assert rep["accuracy_ppm"] > majority_ppm, (
        rep["accuracy_ppm"],
        majority_ppm,
    )
