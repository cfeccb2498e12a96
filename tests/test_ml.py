"""Spam pipeline: training-set oracle, SGD replay oracle, apply/ensemble
consistency."""

from __future__ import annotations

import hashlib
import math
import re

import duckdb
import pytest

from .oracle import assert_matches_oracle


def py_tokenize(text: str) -> list[str]:
    toks = [
        re.sub(r"(^[^a-z]+|[^a-z]+$)", "", t) for t in re.split(r"\s+", text.lower())
    ]
    return [t for t in toks if t]


def py_feature(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 10_007


def py_sgd(rows, delta=0.002):
    """Replay of the reference fold (TrainSpamClassifier.scala:68-85) over
    (docid, is_spam, features) sorted by docid."""
    w: dict[int, float] = {}
    for _, is_spam, feats in sorted(rows, key=lambda r: r[0]):
        score = sum(w.get(f, 0.0) for f in feats)
        prob = 1.0 / (1.0 + math.exp(-score))
        upd = (is_spam - prob) * delta
        for f in feats:
            w[f] = w.get(f, 0.0) + upd
    return w


def _docs(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()


def test_training_set_matches_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    q = entrymod.queries()["spam_training_set"]
    sql = entrymod.oracle_sql()["spam_training_set"]
    assert_matches_oracle(q(spark, sf_correct), sql, sf_correct)


def test_sgd_family_matches_recursive_cte_oracle(spark, sf_smoke):
    """The recursive-CTE replay oracle (plans/catalog.py _sgd_with) tracks
    the Spark fold bit-for-bit at output rounding — plain, shuffled, and
    the downstream AUC."""
    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in ("spam_train", "spam_train_shuffled", "spam_model_auc"):
        assert_matches_oracle(qs[name](spark, sf_smoke), oracles[name], sf_smoke)


def test_sgd_matches_python_replay(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.ml import train_spam_classifier

    got = {r.feature: r.weight for r in train_spam_classifier(spark, sf_smoke).collect()}
    rows = [
        (doc_id, 1 if doc_id % 3 == 0 else 0, [py_feature(t) for t in py_tokenize(text)])
        for doc_id, text in _docs(sf_smoke)
    ]
    want = py_sgd(rows)
    assert set(got) == set(want)
    for f, wv in want.items():
        assert got[f] == pytest.approx(wv, abs=1e-12)


def test_apply_consistent_with_weights(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.ml import apply_spam_classifier

    rows = apply_spam_classifier(spark, sf_smoke).collect()
    assert len(rows) == len(_docs(sf_smoke))
    for r in rows:
        assert r.pred == ("spam" if r.score > 0 else "ham")


def test_ensemble_vote_score_domain(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.ml import apply_ensemble_vote

    rows = apply_ensemble_vote(spark, sf_smoke).collect()
    assert {r.score for r in rows} <= {-3.0, -1.0, 1.0, 3.0}
    for r in rows:
        assert r.pred == ("spam" if r.score > 0 else "ham")


def test_calibration_bins_match_oracle_and_partition(spark, sf_smoke):
    import __spark_entry__ as entrymod

    from .oracle import assert_matches_oracle

    name = "spam_calibration_bins"
    assert_matches_oracle(
        entrymod.queries()[name](spark, sf_smoke),
        entrymod.oracle_sql()[name],
        sf_smoke,
    )

    from bigdata_infra_cs489_spark.operators.ml import (
        CALIB_BINS,
        spam_calibration_bins,
        spam_training_set,
    )

    rows = spam_calibration_bins(spark, sf_smoke).collect()
    assert sum(r.n_docs for r in rows) == spam_training_set(spark, sf_smoke).count()
    for r in rows:
        assert 0 <= r.bin < CALIB_BINS
        assert 0 <= r.avg_pred_prob <= 1 and 0 <= r.spam_rate <= 1
