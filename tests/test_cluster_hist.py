"""dedup_cluster_hist (near-dup cluster size distribution served from
the standing cluster asset) vs an inline DuckDB oracle replaying the CC
closure, plus conservation invariants (staged for round-10 registration
per the window contract)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.dedup import dedup_cluster_hist

from .oracle import assert_matches_oracle


def _hist_sql() -> str:
    from bigdata_infra_cs489_spark.operators import dedup as D
    from bigdata_infra_cs489_spark.plans.catalog import DUCK_MINHASH_PAIR_CTES

    return f"""
    WITH RECURSIVE {DUCK_MINHASH_PAIR_CTES},
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        WHERE jaccard >= {D.JACCARD_THRESHOLD}
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
        WHERE jaccard >= {D.JACCARD_THRESHOLD}),
    reach AS (
        SELECT doc_id AS src, doc_id AS dst FROM documents
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
    cl AS (SELECT src AS doc_id, min(dst) AS cluster_id
           FROM reach GROUP BY src),
    sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
              FROM cl GROUP BY cluster_id)
    SELECT cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY cluster_size
    """


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
