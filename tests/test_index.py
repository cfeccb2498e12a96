"""Inverted index + boolean retrieval vs oracle, plus the bucketed
point-lookup path."""

from __future__ import annotations

import tempfile

import pytest

from .oracle import assert_matches_oracle

INDEX = [
    "inverted_index_postings",
    "inverted_index_df",
    "boolean_retrieval",
    "positional_postings",
    "phrase_retrieval",
]


@pytest.mark.parametrize("name", INDEX)
def test_matches_oracle(spark, sf_correct, name):
    import __spark_entry__ as entrymod

    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    assert_matches_oracle(q(spark, sf_correct), sql, sf_correct)


def test_postings_arrays_sorted(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.index import postings_arrays

    rows = postings_arrays(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        ids = [p.doc_id for p in r.postings]
        assert ids == sorted(ids)
        assert r.df == len(ids)


def test_bucketed_lookup_roundtrip(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.index import (
        lookup_term,
        postings,
        write_bucketed_index,
    )

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/idx"
        write_bucketed_index(postings(spark, sf_smoke), path, n_buckets=8)
        got = lookup_term(spark, path, "fast", n_buckets=8)
        expect = postings(spark, sf_smoke).where("term = 'fast'")
        assert sorted((r.doc_id, r.tf) for r in got.collect()) == sorted(
            (r.doc_id, r.tf) for r in expect.collect()
        )
        # pruning: the scan should touch at most 1 bucket directory
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan


def test_boolean_retrieval_malformed(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.index import boolean_retrieval

    with pytest.raises(ValueError):
        boolean_retrieval(spark, sf_smoke, "AND")
    with pytest.raises(ValueError):
        boolean_retrieval(spark, sf_smoke, "fast table")


@pytest.mark.parametrize("name", ["tfidf_scores", "ranked_retrieval"])
def test_ranked_matches_oracle(spark, sf_correct, name):
    import __spark_entry__ as entrymod

    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    assert_matches_oracle(q(spark, sf_correct), sql, sf_correct)


def test_ranked_retrieval_orders_descending(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.index import ranked_retrieval

    rows = ranked_retrieval(spark, sf_smoke, "fast data").collect()
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert len(rows) <= 10 and rows


def test_bm25_matches_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    q = entrymod.queries()["bm25_retrieval"]
    sql = entrymod.oracle_sql()["bm25_retrieval"]
    assert_matches_oracle(q(spark, sf_correct), sql, sf_correct)


def test_bm25_empty_tokenization_returns_empty(spark, tmp_path):
    """A corpus whose docs tokenize to nothing yields an empty result, not
    a crash (the dl sum is NULL there)."""
    from bigdata_infra_cs489_spark.operators.index import bm25_retrieval

    docs = spark.createDataFrame(
        [(0, "123 456"), (1, "!!! ???")], "doc_id long, text string"
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = bm25_retrieval(spark, str(tmp_path), "fast data")
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["doc_id", "score"]


def test_phrase_retrieval_adjacency(spark):
    """Only consecutive occurrences count: 'fast table' matches doc 0 twice,
    doc 1 (reversed order) and doc 2 (gap between words) not at all."""
    from bigdata_infra_cs489_spark.operators import index as I
    from bigdata_infra_cs489_spark.sources import tables

    docs = spark.createDataFrame(
        [
            (0, "a fast table and another fast table here"),
            (1, "table fast"),
            (2, "fast and slow table"),
        ],
        "doc_id long, text string",
    )
    orig = tables.load
    try:
        I.load = lambda s, d, n, **kw: docs
        got = {
            r["doc_id"]: r["n_matches"]
            for r in I.phrase_retrieval(spark, "unused", "fast table").collect()
        }
    finally:
        I.load = orig
    assert got == {0: 2}
