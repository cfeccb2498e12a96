"""Materialized vector index: probe-time partition pruning + parity with
the scan-everything variants (operators/vector_index.py)."""

from __future__ import annotations

import os

import pytest

from bigdata_infra_cs489_spark.operators import similarity as S
from bigdata_infra_cs489_spark.operators import vector_index as VI


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def index_path(spark, sf_smoke):
    return VI.ensure_vector_index(spark, sf_smoke)


def test_layouts_on_disk(index_path):
    ivf_parts = [
        d for d in os.listdir(os.path.join(index_path, "ivf"))
        if d.startswith("centroid_id=")
    ]
    assert len(ivf_parts) > 1  # buckets exist to prune between
    lsh_bands = [
        d for d in os.listdir(os.path.join(index_path, "lsh"))
        if d.startswith("band=")
    ]
    assert len(lsh_bands) == S.LSH_N_BANDS


def test_ivf_probe_is_partition_pruned(spark, sf_smoke, index_path):
    plan = _plan(VI.ivf_topk_indexed(spark, sf_smoke))
    # the probed centroid ids must appear as a literal PartitionFilter on
    # the index scan — static pruning, not a post-scan filter
    scan_lines = [
        ln for ln in plan.splitlines()
        if "PartitionFilters" in ln and "centroid_id" in ln
    ]
    assert scan_lines, f"no partition filter on centroid_id:\n{plan}"
    assert "centroid_id#" in scan_lines[0] and "IN" in scan_lines[0].upper()


def test_lsh_probe_is_partition_pruned(spark, sf_smoke, index_path):
    plan = _plan(VI.lsh_topk_indexed(spark, sf_smoke))
    scan_lines = [
        ln for ln in plan.splitlines()
        if "PartitionFilters" in ln and "band" in ln
    ]
    assert scan_lines, f"no partition filter on (band, band_val):\n{plan}"
    assert "band_val" in scan_lines[0]


def test_ivf_indexed_matches_unindexed(spark, sf_smoke, index_path):
    got = sorted(map(tuple, VI.ivf_topk_indexed(spark, sf_smoke).collect()))
    want = sorted(map(tuple, S.ivf_topk(spark, sf_smoke).collect()))
    assert got == want


def test_lsh_indexed_matches_unindexed(spark, sf_smoke, index_path):
    got = sorted(map(tuple, VI.lsh_topk_indexed(spark, sf_smoke).collect()))
    want = sorted(map(tuple, S.lsh_topk(spark, sf_smoke).collect()))
    assert got == want


def test_build_is_write_once(spark, sf_smoke, index_path):
    marker = os.path.join(index_path, "ivf", "_SUCCESS")
    before = os.stat(marker).st_mtime_ns
    VI.ensure_vector_index(spark, sf_smoke)  # same data generation: no-op
    assert os.stat(marker).st_mtime_ns == before


def test_append_is_visible_to_probes_without_rebuild(spark, sf_smoke, index_path):
    """Appending a vector nearly identical to the query makes it the new
    top hit through the EXISTING index — no rebuild — and existing
    results are otherwise preserved."""
    from pyspark.sql import functions as F

    from bigdata_infra_cs489_spark.operators.similarity import QUERY_VEC_ID, _emb
    from bigdata_infra_cs489_spark.operators.vector_index import (
        append_to_vector_index,
        ivf_topk_indexed,
        lsh_topk_indexed,
    )

    before_ivf = ivf_topk_indexed(spark, sf_smoke).collect()
    qvec = (
        _emb(spark, sf_smoke)
        .where(F.col("vec_id") == QUERY_VEC_ID)
        .collect()[0]["embedding"]
    )
    new_id = 1_000_000
    new_vec = spark.createDataFrame(
        [(new_id, [v * 0.999 for v in qvec])],
        "vec_id bigint, embedding array<double>",
    )
    append_to_vector_index(spark, sf_smoke, index_path, new_vec)
    try:
        after_ivf = ivf_topk_indexed(spark, sf_smoke).collect()
        after_lsh = lsh_topk_indexed(spark, sf_smoke).collect()
        # the appended scaled copy scores cosine 1.0 and lands right
        # after the query vector itself (tie at 1.0 broken by vec_id)
        assert after_ivf[0]["vec_id"] == before_ivf[0]["vec_id"]
        assert after_ivf[1]["vec_id"] == new_id
        assert after_ivf[1]["cosine"] == 1.0
        assert after_lsh[1]["vec_id"] == new_id
        # everything below shifts down by exactly one slot
        assert [r["vec_id"] for r in after_ivf[2:]] == [
            r["vec_id"] for r in before_ivf[1:-1]
        ]
    finally:
        # leave the on-disk index as the build produced it for other tests
        import shutil

        shutil.rmtree(index_path, ignore_errors=True)


def test_concurrent_build_and_probe_race(spark, sf_smoke):
    """The round-10 regression: with the standing index ABSENT, several
    threads ensure+probe simultaneously. The old direct
    mode('overwrite')-into-final-path build let two builders overwrite
    each other under a live reader (flaky torn-layout failures in the
    parallel sweep); the temp-build + atomic per-subdir publish must
    give every thread the correct probe result and leave one complete
    index behind."""
    import shutil
    from concurrent.futures import ThreadPoolExecutor

    path = VI.vector_index_path(sf_smoke)
    shutil.rmtree(path, ignore_errors=True)
    expected = {
        r["vec_id"]
        for r in S.lsh_topk(spark, sf_smoke).collect()
    }

    def probe(i):
        if i % 2 == 0:
            return {r["vec_id"] for r in VI.lsh_topk_indexed(spark, sf_smoke).collect()}
        VI.ensure_vector_index(spark, sf_smoke)
        return {r["vec_id"] for r in VI.lsh_topk_indexed(spark, sf_smoke).collect()}

    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(probe, range(4)))
    for got in results:
        assert got == expected
    assert all(
        os.path.exists(os.path.join(path, sub, "_SUCCESS"))
        for sub in ("ivf", "lsh")
    )
