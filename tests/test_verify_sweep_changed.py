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


def test_oracle_cache_hits_and_invalidates(tmp_path, monkeypatch):
    """run_oracle_cached returns identical results from disk on a repeat
    call (cached=True) and re-runs on any SQL text change — the (sql,
    fixture digest) key IS the semantics."""
    import duckdb

    from tools import verify_sweep as vs

    monkeypatch.setattr(vs, "CACHE_DIR", str(tmp_path / "cache"))
    con = duckdb.connect()
    sql = "SELECT 1 AS a, 'x' AS b"
    cols1, rows1, cached1 = vs.run_oracle_cached(con, "q", sql, "fix1")
    assert (cols1, rows1, cached1) == (["a", "b"], [(1, "x")], False)
    cols2, rows2, cached2 = vs.run_oracle_cached(con, "q", sql, "fix1")
    assert (cols2, rows2, cached2) == (["a", "b"], [(1, "x")], True)
    # SQL change -> miss; fixture change -> miss
    _c, r3, cached3 = vs.run_oracle_cached(con, "q", sql + " ", "fix1")
    assert cached3 is False and r3 == [(1, "x")]
    _c, _r, cached4 = vs.run_oracle_cached(con, "q", sql, "fix2")
    assert cached4 is False
