"""JL random projection vs an inline DuckDB oracle (sign matrix
single-sourced from rp_sign_matrix) and a NumPy replay, plus the
recall gate's fixture signal (staged for round-8 registration per the
window contract)."""

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


def _projected_sql() -> str:
    signs = rp_sign_matrix()
    cols = ",\n           ".join(
        "round(list_sum(list_transform(range(1, "
        f"{RP_IN_DIM + 1}), i -> embedding[i] * ([{', '.join(str(s) + '.0' for s in row)}])[i])), 6) AS y{j}"
        for j, row in enumerate(signs)
    )
    return f"""
    SELECT vec_id,
           {cols}
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
          FROM embeddings)
    """


def _recall_sql() -> str:
    from bigdata_infra_cs489_spark.operators.similarity import (
        QUERY_VEC_ID,
        RP_SHORTLIST,
    )

    ycols = ", ".join(f"y{j}" for j in range(RP_DIM))
    dot = " + ".join(f"p.y{j} * q.y{j}" for j in range(RP_DIM))
    na = " + ".join(f"p.y{j} * p.y{j}" for j in range(RP_DIM))
    nb = " + ".join(f"q.y{j} * q.y{j}" for j in range(RP_DIM))
    return f"""
    WITH proj AS ({_projected_sql()}),
    q AS (SELECT {ycols} FROM proj WHERE vec_id = {QUERY_VEC_ID}),
    rp_short AS (
        SELECT p.vec_id,
               round(({dot}) / (sqrt({na}) * sqrt({nb})), 6) AS cos_rp
        FROM proj p, q
        ORDER BY cos_rp DESC, p.vec_id ASC LIMIT {RP_SHORTLIST}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
          FROM embeddings),
    qe AS (SELECT embedding AS qv FROM e WHERE vec_id = {QUERY_VEC_ID}),
    exact_top AS (
        SELECT e.vec_id,
               round(list_cosine_similarity(e.embedding, qe.qv), 6) AS c
        FROM e, qe
        ORDER BY c DESC, e.vec_id ASC LIMIT {TOP_K})
    SELECT CAST({TOP_K} AS INT) AS k,
           CAST({RP_SHORTLIST} AS INT) AS shortlist,
           CAST(count(*) AS BIGINT) AS n_overlap,
           round(count(*) / {TOP_K}, 6) AS recall
    FROM rp_short JOIN exact_top USING (vec_id)
    """


def test_projected_matches_oracle(spark, sf_correct):
    assert_matches_oracle(rp_projected(spark, sf_correct), _projected_sql(), sf_correct)


def test_recall_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        rp_recall_topk(spark, sf_correct), _recall_sql(), sf_correct
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
