"""HTML extraction vs the registered DuckDB oracle (single-sourced
in plans/catalog.py since round-8 registration) AND a pure-Python `re`
reimplementation, plus crafted real-world-shaped pages."""

from __future__ import annotations

import re

from bigdata_infra_cs489_spark.operators.extraction import (
    EXTRACT_STAGES,
    HREF_RE,
    TITLE_RE,
    decorate_with_html,
    extract_text,
    html_extract,
    html_link_edges,
)

from .oracle import assert_matches_oracle

def test_extract_matches_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    assert_matches_oracle(
        html_extract(spark, sf_correct),
        entrymod.oracle_sql()["html_extract"],
        sf_correct,
    )


def test_edges_match_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    assert_matches_oracle(
        html_link_edges(spark, sf_correct),
        entrymod.oracle_sql()["html_link_edges"],
        sf_correct,
    )


def test_roundtrip_holds_corpus_wide(spark, sf_correct):
    """The extractor must recover the pre-decoration text on EVERY
    document — the lossless-by-construction contract."""
    rows = html_extract(spark, sf_correct).collect()
    assert rows
    assert all(r["roundtrip_ok"] for r in rows)
    assert all(r["n_links"] == 2 for r in rows)


def _py_extract(html: str) -> str:
    out = html
    for pat, rep in EXTRACT_STAGES:
        out = re.sub(pat, rep, out)
    return re.sub(r"\s+", " ", out).strip()


def test_crafted_pages_match_python(spark):
    """The extractor on real-world-shaped pages (attributes on script
    tags, multiple paragraphs, absolute links, self-closing tags,
    chrome) against Python `re` — and sanity on the recovered text."""
    pages = [
        (
            1,
            '<html><head><title>A page</title><script src="/x.js" defer>'
            "if(a<b){go()}</script></head><body>"
            '<nav id="n">Home</nav><p>first para</p>\n<p>second para</p>'
            '<img src="x.png"/><a href="https://ex.org/z">out</a>'
            "<footer>foot</footer></body></html>",
        ),
        (2, "<p>plain</p>"),
        (3, "no markup at all"),
        (4, ""),
        (
            5,
            "<style>p{x:1}</style><p>kept &amp; shown</p>"
            '<a href="/doc/7">seven</a>',
        ),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pages, "doc_id long, html string")
    got = {
        r.doc_id: r.clean
        for r in df.select(
            "doc_id", extract_text(F.col("html")).alias("clean")
        ).collect()
    }
    for d, html in pages:
        assert got[d] == _py_extract(html), d
    assert got[1] == "first para second para out"
    assert got[2] == "plain"
    assert got[3] == "no markup at all"
    assert got[4] == ""
    assert got[5] == "kept &amp; shown seven"


def test_decorated_links_form_a_graph(spark, sf_smoke):
    """Edge targets are the deterministic (id+1, id*31 mod 997) pair per
    source — the shape the graph family consumes."""
    edges = html_link_edges(spark, sf_smoke).collect()
    by_src: dict[int, set[int]] = {}
    for r in edges:
        by_src.setdefault(r.src, set()).add(r.dst)
    for src, dsts in by_src.items():
        assert dsts == {src + 1, (src * 31) % 997}, src


def test_unclosed_script_degrades_predictably(spark):
    """Documented limitation: without a closing tag the non-greedy block
    pattern never fires, so the tag-strip stage removes the markup but
    the script TEXT survives — the identical degradation on Python `re`
    (and on RE2). The test pins the behavior so a future parser swap is
    a visible semantic change, not a silent one."""
    from pyspark.sql import functions as F

    html = "<p>before</p><script>var broken = 1; <p>after</p>"
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    got = df.select(extract_text(F.col("html")).alias("c")).collect()[0]["c"]
    assert got == _py_extract(html)
    assert got == "before var broken = 1; after"
