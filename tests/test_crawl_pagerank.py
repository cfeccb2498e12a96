"""crawl_pagerank_topk (PageRank over the harvested crawl-link graph,
crawled ∪ frontier nodes) vs an unrolled DuckDB oracle (the
_pagerank_topk_sql discipline over html_link_edges' graph), plus mass
conservation and frontier-structure invariants (oracle single-sourced in
plans/catalog.py since round-10 registration)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.extraction import (
    CRAWL_PR_ITERATIONS,
    CRAWL_PR_TOP_K,
    crawl_pagerank_topk,
    html_link_edges,
)

from .oracle import assert_matches_oracle


def _crawl_pr_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["crawl_pagerank"]


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        crawl_pagerank_topk(spark, sf_correct), _crawl_pr_sql(), sf_correct
    )


def test_mass_conserves_and_frontier_scored(spark, sf_smoke):
    """Full rank vector sums to ~1 after every reclaim; the node set is
    crawled ∪ targets; uncrawled link targets carry positive mass (the
    frontier actually gets scored — the fixture decoration always links
    the max doc to an off-corpus 'next' page)."""
    from pyspark.sql import functions as F

    from bigdata_infra_cs489_spark.operators.graph import pagerank_over_edges
    from bigdata_infra_cs489_spark.sources.tables import load

    edges = html_link_edges(spark, sf_smoke).select("src", "dst")
    docs = load(spark, sf_smoke, "documents").select(
        F.col("doc_id").alias("id")
    )
    nodes = docs.union(edges.select(F.col("dst").alias("id"))).distinct()
    ranks = pagerank_over_edges(nodes, edges, CRAWL_PR_ITERATIONS)
    total = ranks.agg(F.sum("mass")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9
    crawled = {r["id"] for r in docs.collect()}
    uncrawled_mass = {
        r["id"]: r["mass"]
        for r in ranks.collect()
        if r["id"] not in crawled
    }
    assert uncrawled_mass, "fixture must have frontier nodes"
    assert all(m > 0 for m in uncrawled_mass.values())


def test_beats_indegree_when_hub_links(spark):
    """The upgrade over raw in-degree: a frontier page linked once by an
    authority (itself pointed at by everyone) outranks a frontier page
    linked twice by leaves."""
    from pyspark.sql import functions as F

    from bigdata_infra_cs489_spark.operators.graph import pagerank_over_edges

    # nodes 1-5 crawled: 1,2,3 -> 4 (hub); 4 -> 100; 5 -> 101 twice
    edges = spark.createDataFrame(
        [(1, 4), (2, 4), (3, 4), (4, 100), (5, 101), (5, 101)],
        "src bigint, dst bigint",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 5, 100, 101)], "id bigint"
    )
    ranks = {
        r["id"]: r["mass"]
        for r in pagerank_over_edges(nodes, edges, 5).collect()
    }
    assert ranks[100] > ranks[101]
    _ = F
