"""Quality-distillation classifier vs the shared recursive-CTE DuckDB
trainer oracle (plans/catalog.py _sgd_with, parametrized with the
text_quality-threshold labels), plus learning-signal invariants (staged
for round-8 registration per the window contract)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.qualitymodel import (
    QUALITY_THRESHOLD,
    quality_model_report,
    quality_model_scores,
    quality_model_weights,
)

from .oracle import assert_matches_oracle


def _quality_ds_sql() -> str:
    from bigdata_infra_cs489_spark.plans.catalog import (
        _SGD_FEAT,
        _TEXT_QUALITY_SQL,
    )

    return f"""
      SELECT q.doc_id AS docid,
             CASE WHEN q.quality_score >= {QUALITY_THRESHOLD} THEN 1 ELSE 0 END
                 AS is_spam,
             CASE WHEN q.quality_score >= {QUALITY_THRESHOLD} THEN 'keep'
                  ELSE 'drop' END AS label,
             CAST(NULL AS INT) AS src_g,
             {_SGD_FEAT} AS feats
      FROM ({_TEXT_QUALITY_SQL}) q JOIN documents USING (doc_id)
    """


def _weights_sql() -> str:
    from bigdata_infra_cs489_spark.plans.catalog import _sgd_with

    return (
        _sgd_with([("m", "TRUE", "d.docid")], ds_sql=_quality_ds_sql())
        + "\n    SELECT feature, round(weight, 6) AS weight FROM sgd_weights_m"
    )


_SCORES_TAIL = """
    , sgd_scores AS (
      SELECT o.docid, coalesce(sum(w.weight), 0.0) AS score
      FROM sgd_occ o LEFT JOIN sgd_weights_m w USING (feature)
      GROUP BY o.docid
    ),
    q_scored AS (
      SELECT d.docid AS doc_id, d.label,
             round(coalesce(s.score, 0.0), 6) AS score,
             CASE WHEN coalesce(s.score, 0.0) > 0 THEN 'keep' ELSE 'drop' END
                 AS pred
      FROM sgd_ds d LEFT JOIN sgd_scores s USING (docid)
    )"""


def _scores_sql() -> str:
    from bigdata_infra_cs489_spark.plans.catalog import _sgd_with

    return (
        _sgd_with([("m", "TRUE", "d.docid")], ds_sql=_quality_ds_sql())
        + _SCORES_TAIL
        + "\n    SELECT * FROM q_scored"
    )


def _report_sql() -> str:
    from bigdata_infra_cs489_spark.plans.catalog import _sgd_with

    return (
        _sgd_with([("m", "TRUE", "d.docid")], ds_sql=_quality_ds_sql())
        + _SCORES_TAIL
        + """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(coalesce(sum(CASE WHEN label = 'keep' THEN 1 END), 0)
                AS BIGINT) AS n_keep_label,
           CAST(coalesce(sum(CASE WHEN pred = 'keep' THEN 1 END), 0)
                AS BIGINT) AS n_keep_pred,
           CAST(coalesce(sum(CASE WHEN label = pred THEN 1 END), 0)
                AS BIGINT) AS n_agree,
           CAST((coalesce(sum(CASE WHEN label = pred THEN 1 END), 0) * 1000000
                 + count(*) // 2) // greatest(count(*), 1) AS BIGINT)
               AS accuracy_ppm
    FROM q_scored"""
    )


def test_weights_match_oracle(spark, sf_correct):
    assert_matches_oracle(
        quality_model_weights(spark, sf_correct), _weights_sql(), sf_correct
    )


def test_scores_match_oracle(spark, sf_correct):
    assert_matches_oracle(
        quality_model_scores(spark, sf_correct), _scores_sql(), sf_correct
    )


def test_report_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        quality_model_report(spark, sf_correct), _report_sql(), sf_correct
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
