"""dedup_cluster_hist (near-dup cluster size distribution served from
the standing cluster asset) vs an inline DuckDB oracle replaying the CC
closure, plus conservation invariants (staged for round-10 registration
per the window contract)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.dedup import dedup_cluster_hist

from .oracle import assert_matches_oracle


def _hist_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["dedup_cluster_hist"]


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        dedup_cluster_hist(spark, sf_correct), _hist_sql(), sf_correct
    )


def test_conserves_and_has_signal(spark, sf_correct):
    """n_docs telescopes to the corpus size; the fixture must contain
    both singletons and at least one multi-doc cluster (otherwise the
    histogram demonstrates nothing); n_docs is exactly
    cluster_size * n_clusters per row."""
    from bigdata_infra_cs489_spark.sources.tables import load

    rows = dedup_cluster_hist(spark, sf_correct).collect()
    n_docs = load(spark, sf_correct, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert all(r["n_docs"] == r["cluster_size"] * r["n_clusters"] for r in rows)
    sizes = {r["cluster_size"] for r in rows}
    assert 1 in sizes
    assert any(s > 1 for s in sizes)
