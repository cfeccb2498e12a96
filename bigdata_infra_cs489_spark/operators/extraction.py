"""HTML → text extraction: the step a crawl pipeline runs before ANY of
the curation families — strip markup, scripts, styles and chrome from
raw HTML, recover the article text, and harvest the link graph.

No reference counterpart (north-star extension family; the
trafilatura/jusText stage of a crawl pipeline, reduced to its
deterministic skeleton). The fixture corpus is plain text, so the
registered-query shape WRAPS each document in deterministic
doc_id-derived HTML inside the query (title, script, style, nav chrome,
one content paragraph, two links, footer — the PII-decoration
convention, mirrored byte-for-byte in the DuckDB twin) and then runs
the real extractor on it; a deployment calls the extractor functions on
its crawled HTML column and skips the decoration.

Scale/determinism design:
- the whole extractor is a chain of codegen'd regexp_replace /
  regexp_extract_all column expressions — zero exchanges, zero Python,
  embarrassingly parallel at any corpus size (the PII plan shape);
- every pattern is RE2-safe (non-greedy ``.*?`` and ``[^>]`` classes,
  no backreferences/lookaround), so DuckDB executes the IDENTICAL
  regexes with identical leftmost-first semantics;
- extraction order is fixed and state-free: drop script blocks, drop
  style blocks, drop nav/footer chrome, replace remaining tags with a
  space, collapse whitespace, trim — each stage a single replace over
  the document string;
- link harvest is one regexp_extract_all over the SAME scan, exploded
  to (src, dst) edge rows — the input the graph family (PageRank, CC,
  degree stats) consumes.

The round-trip contract is test-enforced: on the decorated fixture the
extracted text must equal the original document text EXACTLY (the
decoration is lossless by construction), so the extractor's correctness
is a visible boolean, not a judgment call.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

# chrome the extractor must drop; parametrized by doc_id so every page
# differs (a constant banner would also be caught by line dedup, which
# is exactly why extraction runs FIRST in a real pipeline)
_NAV = "Home | About | Section {m7}"
_FOOTER = "(c) example-site {m5} - all rights reserved"


def decorate_with_html(docs: DataFrame) -> DataFrame:
    """Fixture-only: wrap each document's text in a deterministic HTML
    page. Pure string concat the DuckDB twin reproduces byte-for-byte."""
    did = F.col("doc_id").cast("string")
    m5 = (F.col("doc_id") % 5).cast("string")
    m7 = (F.col("doc_id") % 7).cast("string")
    nxt = (F.col("doc_id") + 1).cast("string")
    rel = ((F.col("doc_id") * 31) % 997).cast("string")
    html = F.concat(
        F.lit("<html><head><title>Doc "), did, F.lit("</title>"),
        F.lit("<script>var page="), did, F.lit(";track(page);</script>"),
        F.lit("<style>.m{color:#000}</style></head><body>"),
        F.lit('<nav class="top">'),
        F.lit(_NAV.split("{m7}")[0]), m7,
        F.lit("</nav><h1>Doc "), did, F.lit("</h1><p>"),
        F.col("text"),
        F.lit('</p><a href="/doc/'), nxt, F.lit('">next</a>'),
        F.lit('<a href="/doc/'), rel, F.lit('">related</a><footer>'),
        F.lit(_FOOTER.split("{m5}")[0]), m5,
        F.lit(_FOOTER.split("{m5}")[1]), F.lit("</footer></body></html>"),
    )
    return docs.select("doc_id", F.col("text").alias("raw_text"), html.alias("html"))


# (pattern, replacement) applied in this fixed order on both engines.
#
# Malformed-markup honesty: this is the deterministic regex skeleton of
# an extractor, not an HTML5 tree builder. An UNCLOSED <script>/<style>
# block never matches its non-greedy pair pattern, so only its tags are
# stripped and its code text survives into the output (pinned by
# tests/test_extraction.py::test_unclosed_script_degrades_predictably);
# a production deployment swaps a real parser into this stage and keeps
# the surrounding plumbing. The shapes are RE2-safe and the fixed stage
# order makes the degradation identical on both engines.
EXTRACT_STAGES: tuple[tuple[str, str], ...] = (
    (r"<script[^>]*>.*?</script>", " "),
    (r"<style[^>]*>.*?</style>", " "),
    (r"<nav[^>]*>.*?</nav>", " "),
    (r"<footer[^>]*>.*?</footer>", " "),
    (r"<title[^>]*>.*?</title>", " "),
    (r"<[^>]+>", " "),
)
TITLE_RE = r"<title[^>]*>(.*?)</title>"
HREF_RE = r'href="([^"]*)"'


def extract_text(html: Column) -> Column:
    """The extractor proper: staged chrome removal, tag strip, whitespace
    collapse. One codegen'd expression tree."""
    out = html
    for pat, rep in EXTRACT_STAGES:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, title, n_links, clean_text, roundtrip_ok): the extraction
    pass over the (decorated) corpus. roundtrip_ok asserts the recovered
    body equals the pre-decoration text minus the injected heading —
    the extractor's quality as a visible boolean on every row."""
    d = decorate_with_html(load(spark, sf_dir, "documents"))
    heading = F.concat(F.lit("Doc "), F.col("doc_id").cast("string"), F.lit(" "))
    body = extract_text(F.col("html"))
    return d.select(
        "doc_id",
        F.regexp_extract("html", TITLE_RE, 1).alias("title"),
        F.size(F.regexp_extract_all("html", F.lit(HREF_RE), F.lit(1)))
        .cast("bigint")
        .alias("n_links"),
        body.alias("clean_text"),
        # expected = the page's visible text, whitespace-collapsed AFTER
        # assembly (collapsing per-piece would leave doubled spaces
        # around empty or padded documents)
        (
            body
            == F.trim(
                F.regexp_replace(
                    F.concat(heading, F.col("raw_text"), F.lit(" next related")),
                    r"\s+",
                    " ",
                )
            )
        ).alias("roundtrip_ok"),
    )


def html_link_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst): the harvested link graph — every href, resolved to its
    numeric target, exploded to edge rows in one pass over the same
    scan. The input shape the graph family consumes (degree stats,
    PageRank, components)."""
    d = decorate_with_html(load(spark, sf_dir, "documents"))
    hrefs = F.regexp_extract_all("html", F.lit(r'href="/doc/(\d+)"'), F.lit(1))
    return (
        d.select(F.col("doc_id").alias("src"), F.explode(hrefs).alias("h"))
        .select("src", F.col("h").cast("bigint").alias("dst"))
        .orderBy("src", "dst")
    )


def link_indegree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(in_degree, n_pages, min_page, max_page): the in-degree histogram
    of the harvested link graph — the crawl-frontier health check run
    right after extraction (a spiky head = link farms / boilerplate nav
    the dedup families will hit; a long tail of 0/1 = frontier still
    open). min/max_page anchor each bucket to concrete exemplars so a
    card reader can spot-check.

    Shape: two partial-aggregated groupBys (dst -> in_degree, then
    in_degree -> histogram row) over the same single decorated scan —
    both combine map-side, no window, output bounded by the distinct
    degree count."""
    deg = (
        html_link_edges(spark, sf_dir)
        .groupBy("dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("in_degree"))
    )
    return deg.groupBy("in_degree").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pages"),
        F.min("dst").alias("min_page"),
        F.max("dst").alias("max_page"),
    )


FRONTIER_K = 50


def crawl_frontier(
    spark: SparkSession, sf_dir: str, k: int = FRONTIER_K
) -> DataFrame:
    """(rank, page, in_degree): the next crawl batch — link targets NOT
    yet in the corpus, ranked by how many crawled pages point at them
    (the classic indegree-priority frontier a BFS crawler pops from).
    Completes the extraction family's crawl loop: extract -> harvest
    edges -> frontier -> fetch -> extract ...

    Shape: one partial-aggregated in-degree groupBy over the harvested
    edges, one LEFT ANTI join against the corpus doc-id spine (the
    crawled set projects to one bigint column), a global top-k via
    TakeOrderedAndProject with explicit (in_degree desc, page asc)
    tie-break, and the in-top-k rank attached with the bounded k^2
    broadcast self-join (the dsir_select_topk pattern — no
    partition-less window)."""
    deg = (
        html_link_edges(spark, sf_dir)
        .groupBy("dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("in_degree"))
    )
    crawled = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("dst")
    )
    top = (
        deg.join(crawled, "dst", "left_anti")
        .orderBy(F.desc("in_degree"), F.asc("dst"))
        .limit(k)
    )
    other = top.select(
        F.col("dst").alias("o_id"), F.col("in_degree").alias("o_d")
    )
    ahead = (F.col("o_d") > F.col("in_degree")) | (
        (F.col("o_d") == F.col("in_degree")) & (F.col("o_id") < F.col("dst"))
    )
    return (
        top.join(F.broadcast(other), ahead, "left")
        .groupBy("dst", "in_degree")
        .agg((F.count("o_id") + 1).cast("int").alias("rank"))
        .select("rank", F.col("dst").alias("page"), "in_degree")
    )


CRAWL_PR_ITERATIONS = 5
CRAWL_PR_TOP_K = 20


def crawl_pagerank_topk(
    spark: SparkSession,
    sf_dir: str,
    iterations: int = CRAWL_PR_ITERATIONS,
    k: int = CRAWL_PR_TOP_K,
) -> DataFrame:
    """(node_id, mass, is_crawled): global top-k PageRank over the
    OBSERVED web graph — crawled pages plus every uncrawled link target
    — closing the extraction family's crawl loop with a principled
    frontier priority: an uncrawled page's PageRank aggregates the
    authority of everything pointing at it (transitively), which is the
    classic upgrade over crawl_frontier's raw in-degree ranking (a page
    linked once by a hub can outrank one linked twice by leaves).

    Composition: html_link_edges harvests (src, dst) from the decorated
    corpus; the node spine is doc ids ∪ link targets; the iteration
    machinery is graph.pagerank_over_edges — uncrawled nodes are
    dangling (outdeg 0), so their received mass re-enters uniformly,
    exactly how a search engine scores its frontier. Ranked on the
    6dp-ROUNDED mass with node_id tie-break (the pagerank_topk
    fp-reproducibility rule); the DuckDB twin unrolls the fixed
    iteration count (the _pagerank_topk_sql discipline)."""
    from .graph import pagerank_over_edges

    edges = html_link_edges(spark, sf_dir).select("src", "dst")
    docs = load(spark, sf_dir, "documents").select(F.col("doc_id").alias("id"))
    nodes = docs.union(edges.select(F.col("dst").alias("id"))).distinct()
    ranks = pagerank_over_edges(nodes, edges, iterations)
    return (
        ranks.join(docs.withColumn("c", F.lit(1)), "id", "left")
        .select(
            F.col("id").alias("node_id"),
            F.round("mass", 6).alias("mass"),
            F.col("c").isNotNull().alias("is_crawled"),
        )
        .orderBy(F.desc("mass"), F.asc("node_id"))
        .limit(k)
    )
