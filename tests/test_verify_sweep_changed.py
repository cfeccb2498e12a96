"""The --changed target derivation in tools/verify_sweep: source-level
import closure from changed operator files to affected registered
queries (plans/ glue excluded from propagation; spine changes fall back
to a full sweep)."""

from __future__ import annotations

from tools.verify_sweep import (
    FULL_SWEEP_PREFIXES,
    _affected_modules,
    _query_modules,
)

PKG = "bigdata_infra_cs489_spark"


def _selected(module: str) -> set[str]:
    from bigdata_infra_cs489_spark.plans import registry

    aff = _affected_modules({f"{PKG}.operators.{module}"})
    return {
        n for n, fn in registry.queries().items() if _query_modules(fn) & aff
    }


def test_leaf_module_selects_only_its_queries():
    assert _selected("extraction") == {
        "html_extract",
        "html_link_edges",
        "link_indegree_hist",
        "crawl_frontier",
        "crawl_pagerank",
    }
    assert _selected("qualitymodel") == {
        "quality_model_weights",
        "quality_model_scores",
        "quality_model_report",
    }


def test_closure_follows_function_local_imports():
    # curate.py imports linededup INSIDE a function body; the source-level
    # scan must still catch it, along with the streaming twin.
    sel = _selected("linededup")
    assert {
        "dup_line_stats",
        "line_dedup_corpus",
        "incremental_line_dedup",
        "stream_line_dedup",
        "corpus_curate_v2",
        "incremental_curate",
    } <= sel
    # ...but NOT the whole registry: a leaf change must never select
    # unrelated relational queries through the plans/ registration glue.
    assert "q1_count_shipped" not in sel
    assert len(sel) < 20


def test_spine_prefixes_cover_the_registration_glue():
    assert any(p.startswith(f"{PKG}/plans") for p in FULL_SWEEP_PREFIXES)
    assert f"{PKG}/session.py" in FULL_SWEEP_PREFIXES
