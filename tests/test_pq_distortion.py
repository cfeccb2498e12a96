"""pq_distortion_stats vs an inline DuckDB oracle (composed from the
registered _PQ_COMMON fragment) and a NumPy replay (single-sourced in plans/catalog.py since round-9 registration)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from bigdata_infra_cs489_spark.operators.similarity import (
    PQ_K,
    PQ_M,
    pq_distortion_stats,
)

from .oracle import assert_matches_oracle


def _stats_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["pq_distortion_stats"]


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        pq_distortion_stats(spark, sf_correct), _stats_sql(), sf_correct
    )


def test_matches_numpy_replay(spark, sf_smoke):
    """Distortion = min over the PQ_K sub-centroids (subvectors of the
    first PQ_K vectors) of the squared L2 distance, per subspace; means
    are rounded integer division of micro-scaled int64s. A codebook
    vector's own distortion is 0."""
    tbl = pq.read_table(f"{sf_smoke}/embeddings.parquet")
    vid = tbl["vec_id"].to_pylist()
    mat = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(vid)
    vid = [vid[i] for i in order]
    mat = mat[order]
    cents = np.stack(np.split(mat[np.array(vid) < PQ_K], PQ_M, axis=1))
    subs = np.stack(np.split(mat, PQ_M, axis=1))  # (m, n, dsub)
    got = {
        r["subspace"]: (
            r["n_vecs"],
            r["mean_sqdist_micro"],
            r["max_sqdist_micro"],
        )
        for r in pq_distortion_stats(spark, sf_smoke).collect()
    }
    assert set(got) == set(range(PQ_M))
    for j in range(PQ_M):
        d = ((subs[j][:, None, :] - cents[j][None, :, :]) ** 2).sum(axis=2)
        micro = np.floor(d.min(axis=1) * 1e6 + 0.5).astype(np.int64)
        n = len(micro)
        mean = (int(micro.sum()) + n // 2) // n
        assert got[j][0] == n
        # the numpy vectorized sum can differ from the engines' shared
        # left-to-right fold in the last ulp -> allow 1 micro of slack
        assert abs(got[j][1] - mean) <= 1, j
        assert abs(got[j][2] - int(micro.max())) <= 1, j
        # codebook vectors quantize to themselves
        code_rows = [i for i, v in enumerate(vid) if v < PQ_K]
        assert all(micro[i] == 0 for i in code_rows)
