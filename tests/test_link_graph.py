"""link_indegree_hist vs an inline DuckDB oracle plus conservation
invariants (single-sourced in plans/catalog.py since round-9 registration)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.extraction import (
    html_link_edges,
    link_indegree_hist,
)

from .oracle import assert_matches_oracle


def _hist_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["link_indegree_hist"]


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        link_indegree_hist(spark, sf_correct), _hist_sql(), sf_correct
    )


def test_conserves_edges_and_pages(spark, sf_smoke):
    """sum(in_degree * n_pages) must equal the edge count and
    sum(n_pages) the distinct-target count — the histogram loses
    nothing."""
    edges = html_link_edges(spark, sf_smoke).collect()
    hist = link_indegree_hist(spark, sf_smoke).collect()
    assert sum(r["in_degree"] * r["n_pages"] for r in hist) == len(edges)
    assert sum(r["n_pages"] for r in hist) == len({r["dst"] for r in edges})
    for r in hist:
        assert r["min_page"] <= r["max_page"]


def _frontier_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["crawl_frontier"]


def test_frontier_matches_oracle(spark, sf_correct):
    from bigdata_infra_cs489_spark.operators.extraction import crawl_frontier

    assert_matches_oracle(
        crawl_frontier(spark, sf_correct), _frontier_sql(), sf_correct
    )


def test_frontier_is_uncrawled_and_ranked(spark, sf_smoke):
    """Every frontier page is absent from the corpus, ranks are dense
    and ordered by (in_degree desc, page asc), and the fixture must
    actually have uncrawled targets (the decoration links to doc_id+1,
    so the max doc's 'next' link always points off-corpus)."""
    from bigdata_infra_cs489_spark.operators.extraction import crawl_frontier
    from bigdata_infra_cs489_spark.sources.tables import load

    rows = sorted(
        crawl_frontier(spark, sf_smoke).collect(), key=lambda r: r["rank"]
    )
    assert rows
    crawled = {
        r["doc_id"] for r in load(spark, sf_smoke, "documents").select("doc_id").collect()
    }
    assert all(r["page"] not in crawled for r in rows)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    keys = [(-r["in_degree"], r["page"]) for r in rows]
    assert keys == sorted(keys)
