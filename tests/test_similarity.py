"""Similarity search vs DuckDB oracle + ANN recall sanity."""

from __future__ import annotations

import pytest

from .oracle import assert_matches_oracle

SIM = ["cosine_topk", "ivf_assignments", "ivf_topk", "embedding_near_duplicates"]


@pytest.mark.parametrize("name", SIM)
def test_matches_oracle(spark, sf_correct, name):
    import __spark_entry__ as entrymod

    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    assert_matches_oracle(q(spark, sf_correct), sql, sf_correct)


def test_query_vector_ranks_first(spark, sf_correct):
    from bigdata_infra_cs489_spark.operators.similarity import QUERY_VEC_ID, cosine_topk

    rows = cosine_topk(spark, sf_correct).collect()
    assert rows[0].vec_id == QUERY_VEC_ID
    assert rows[0].cosine == pytest.approx(1.0, abs=1e-6)
    cosines = [r.cosine for r in rows]
    assert cosines == sorted(cosines, reverse=True)


def test_ivf_recall_vs_bruteforce(spark, sf_correct):
    """IVF with nprobe=2 of 16 centroids should still recover most of the
    true top-10 (sanity bound, not a tight guarantee)."""
    from bigdata_infra_cs489_spark.operators.similarity import cosine_topk, ivf_topk

    exact = {r.vec_id for r in cosine_topk(spark, sf_correct).collect()}
    approx = {r.vec_id for r in ivf_topk(spark, sf_correct).collect()}
    assert len(exact & approx) >= 3
