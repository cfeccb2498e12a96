"""crawl_pagerank_topk (PageRank over the harvested crawl-link graph,
crawled ∪ frontier nodes) vs an unrolled DuckDB oracle (the
_pagerank_topk_sql discipline over html_link_edges' graph), plus mass
conservation and frontier-structure invariants (staged for round-10
registration per the window contract)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.extraction import (
    CRAWL_PR_ITERATIONS,
    CRAWL_PR_TOP_K,
    crawl_pagerank_topk,
    html_link_edges,
)

from .oracle import assert_matches_oracle


def _crawl_pr_sql() -> str:
    from bigdata_infra_cs489_spark.operators.graph import ALPHA
    from bigdata_infra_cs489_spark.plans.catalog import DUCK_HTML_DECORATED

    om, al = repr(1.0 - ALPHA), repr(ALPHA)
    nn = "(SELECT c FROM n)"
    ctes = [
        f"d AS MATERIALIZED ({DUCK_HTML_DECORATED})",
        "edges AS MATERIALIZED (SELECT doc_id AS src, CAST(h AS BIGINT)"
        " AS dst FROM (SELECT doc_id,"
        " unnest(regexp_extract_all(html, 'href=\"/doc/(\\d+)\"', 1)) AS h"
        " FROM d))",
        "nodes AS MATERIALIZED (SELECT DISTINCT id FROM"
        " (SELECT doc_id AS id FROM documents"
        "  UNION ALL SELECT dst FROM edges))",
        "n AS MATERIALIZED (SELECT count(*) AS c FROM nodes)",
        "outdeg AS MATERIALIZED (SELECT src AS id, count(*) AS outdeg"
        " FROM edges GROUP BY src)",
        f"r0 AS MATERIALIZED (SELECT id,"
        f" CAST(1.0 AS DOUBLE) / {nn} AS m FROM nodes)",
    ]
    for it in range(1, CRAWL_PR_ITERATIONS + 1):
        p = it - 1
        ctes.append(
            f"msg{it} AS MATERIALIZED (SELECT e.dst AS id,"
            f" sum(r.m / o.outdeg) AS c FROM r{p} r"
            f" JOIN outdeg o ON o.id = r.id JOIN edges e ON e.src = r.id"
            f" GROUP BY e.dst)"
        )
        ctes.append(
            f"rec{it} AS MATERIALIZED (SELECT nd.id,"
            f" coalesce(m.c, CAST(0.0 AS DOUBLE)) AS m"
            f" FROM nodes nd LEFT JOIN msg{it} m ON m.id = nd.id)"
        )
        ctes.append(
            f"mis{it} AS MATERIALIZED (SELECT"
            f" greatest(CAST(0.0 AS DOUBLE), 1.0 - sum(m)) AS x FROM rec{it})"
        )
        ctes.append(
            f"r{it} AS MATERIALIZED (SELECT id,"
            f" {al} / {nn} + {om} * (m + (SELECT x FROM mis{it}) / {nn}) AS m"
            f" FROM rec{it})"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT node_id, mass, is_crawled FROM (
        SELECT r.id AS node_id, round(r.m, 6) AS mass,
               (dd.doc_id IS NOT NULL) AS is_crawled,
               row_number() OVER (ORDER BY round(r.m, 6) DESC, r.id) AS rn
        FROM r{CRAWL_PR_ITERATIONS} r
        LEFT JOIN documents dd ON dd.doc_id = r.id)
    WHERE rn <= {CRAWL_PR_TOP_K}"""
    )


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
