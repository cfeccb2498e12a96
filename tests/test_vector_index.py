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
