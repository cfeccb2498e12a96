"""JL random projection vs the registered DuckDB oracle (single-sourced
in plans/catalog.py since round-8 registration; sign matrix from
rp_sign_matrix) and a NumPy replay, plus the recall gate's fixture
signal."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from bigdata_infra_cs489_spark.operators.similarity import (
    RP_DIM,
    RP_IN_DIM,
    TOP_K,
    rp_projected,
    rp_recall_topk,
    rp_sign_matrix,
)

from .oracle import assert_matches_oracle


def test_projected_matches_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    assert_matches_oracle(
        rp_projected(spark, sf_correct),
        entrymod.oracle_sql()["rp_projected"],
        sf_correct,
    )


def test_recall_matches_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    assert_matches_oracle(
        rp_recall_topk(spark, sf_correct),
        entrymod.oracle_sql()["rp_recall_topk"],
        sf_correct,
    )


def test_projection_matches_numpy(spark, sf_smoke):
    """y = S @ v for the single-sourced sign matrix, to 6dp."""
    tbl = pq.read_table(f"{sf_smoke}/embeddings.parquet")
    vecs = {
        int(i): np.asarray(v, dtype=np.float64)
        for i, v in zip(tbl["vec_id"].to_pylist(), tbl["embedding"].to_pylist())
    }
    S = np.asarray(rp_sign_matrix(), dtype=np.float64)
    got = {r["vec_id"]: [r[f"y{j}"] for j in range(RP_DIM)] for r in
           rp_projected(spark, sf_smoke).collect()}
    assert set(got) == set(vecs)
    for i, v in vecs.items():
        want = S @ v
        assert np.allclose(got[i], np.round(want, 6), atol=2e-6), i


def test_recall_has_signal(spark, sf_correct):
    """The coarse-filter gate must beat the random-shortlist baseline
    (shortlist/n of the exact top-k by chance) and always retain the
    query's own vector — a lift near 1x would mean the sign matrix or
    the projected search is broken in a way the oracle (which would
    agree) cannot see. The fixture's iid embeddings cap recall well
    below 1.0 by construction (see the operator docstring)."""
    from bigdata_infra_cs489_spark.operators.similarity import RP_SHORTLIST, _emb

    r = rp_recall_topk(spark, sf_correct).collect()[0]
    n = _emb(spark, sf_correct).count()
    baseline = TOP_K * RP_SHORTLIST / n
    assert r["k"] == TOP_K and r["shortlist"] == RP_SHORTLIST
    assert r["n_overlap"] >= 1  # the query vector itself
    assert r["n_overlap"] >= 2 * baseline, (r, baseline)
    assert abs(r["recall"] - r["n_overlap"] / TOP_K) < 1e-9
