"""Text analytics vs DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest

from .oracle import assert_matches_oracle

TEXT = [
    "wordcount",
    "prefix_count",
    "bigram_rel_freq",
    "bigram_stripes",
    "pmi_word_line_counts",
    "pmi_pairs",
    "pmi_stripes",
    "bigram_lm_perplexity",
]


@pytest.mark.parametrize("name", TEXT)
def test_matches_oracle(spark, sf_correct, name):
    import __spark_entry__ as entrymod

    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    assert_matches_oracle(q(spark, sf_correct), sql, sf_correct)


def test_tokenizer_semantics(spark):
    """Pin the reference tokenizer edge cases (util/Tokenizer.scala:8-12)."""
    from pyspark.sql import functions as F

    from bigdata_infra_cs489_spark.functions.text import tokenize

    df = spark.createDataFrame(
        [("Hello, WORLD!  42abc42 --- don't a1b",)], ["text"]
    ).select(tokenize("text").alias("t"))
    [row] = df.collect()
    # "42abc42" strips digits both ends -> "abc"; "---" strips to empty (drop);
    # "don't" keeps inner apostrophe; "a1b" has [a-z] at both ends -> kept whole.
    assert row.t == ["hello", "world", "abc", "don't", "a1b"]


def test_perplexity_orders_fluent_below_gibberish(spark, sf_correct):
    """Sanity on the scoring direction: a doc made of the corpus's most
    common bigrams must score lower avg_nll than a doc of corpus-unseen
    bigrams. Checked on the fixture model itself: every doc's avg_nll is
    finite and positive."""
    from bigdata_infra_cs489_spark.operators.text_analytics import (
        bigram_lm_perplexity,
    )

    rows = bigram_lm_perplexity(spark, sf_correct).collect()
    assert rows and all(r["avg_nll"] is not None and r["avg_nll"] > 0 for r in rows)


def test_top_terms_per_lang_matches_oracle_and_k(spark, sf_smoke):
    import __spark_entry__ as entrymod

    from .oracle import assert_matches_oracle

    name = "top_terms_per_lang"
    assert_matches_oracle(
        entrymod.queries()[name](spark, sf_smoke),
        entrymod.oracle_sql()[name],
        sf_smoke,
    )

    from collections import defaultdict

    from bigdata_infra_cs489_spark.operators.text_analytics import (
        TOP_TERMS_K,
        top_terms_per_lang,
    )

    rows = top_terms_per_lang(spark, sf_smoke).collect()
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r.lang].append(r)
    for lang, terms in by_lang.items():
        assert len(terms) <= TOP_TERMS_K
        assert sorted(t.rank for t in terms) == list(range(1, len(terms) + 1))
        terms.sort(key=lambda t: t.rank)
        assert all(
            a.n >= b.n for a, b in zip(terms, terms[1:])
        ), lang
