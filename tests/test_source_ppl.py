"""source_perplexity_report (per-source LM-quality ranking card) vs an
inline DuckDB oracle composed from the registered CCNet bucket SQL,
plus consistency invariants against the bucket assignment (oracle
single-sourced in plans/catalog.py since round-10 registration)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.ccnet import (
    ccnet_perplexity_buckets,
    source_perplexity_report,
)

from .oracle import assert_matches_oracle


def _report_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["source_perplexity_report"]


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        source_perplexity_report(spark, sf_correct), _report_sql(), sf_correct
    )


def test_consistent_with_buckets(spark, sf_smoke):
    """Tercile counts partition each source's scoreable docs; the card
    conserves to the bucket assignment; head_ppm replays exactly; the
    fixture must rank sources non-trivially (not all head_ppm equal)."""
    from bigdata_infra_cs489_spark.sources.tables import load

    buckets = ccnet_perplexity_buckets(spark, sf_smoke).collect()
    src = {
        r["doc_id"]: r["source"]
        for r in load(spark, sf_smoke, "documents").select("doc_id", "source").collect()
    }
    per: dict[str, dict[str, int]] = {}
    for r in buckets:
        d = per.setdefault(src[r["doc_id"]], {"n": 0, "head": 0, "middle": 0, "tail": 0})
        d["n"] += 1
        d[r["bucket"]] += 1
    rows = source_perplexity_report(spark, sf_smoke).collect()
    assert {r["source"] for r in rows} == set(per)
    for r in rows:
        w = per[r["source"]]
        assert r["n_docs"] == w["n"]
        assert (r["head_docs"], r["middle_docs"], r["tail_docs"]) == (
            w["head"], w["middle"], w["tail"],
        )
        assert r["head_docs"] + r["middle_docs"] + r["tail_docs"] == r["n_docs"]
        assert r["head_ppm"] == (r["head_docs"] * 1_000_000 + r["n_docs"] // 2) // r["n_docs"]
    assert len({r["head_ppm"] for r in rows}) > 1
