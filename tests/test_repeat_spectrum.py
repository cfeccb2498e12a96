"""repeat_spectrum (all-scale exact-substring repetition via Rabin-Karp
doubling) vs its REGISTERED DuckDB oracle (catalog.py replays the
identical md5 doubling chain — single-sourced since the round-14
rotation), plus a pure-Python TRUE token-tuple replay that checks the
hash chain itself."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.spans import (
    REPEAT_LEVELS,
    repeat_spectrum,
)

from .oracle import assert_matches_oracle


def repeat_spectrum_oracle_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["repeat_spectrum"]


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        repeat_spectrum(spark, sf_correct),
        repeat_spectrum_oracle_sql(),
        sf_correct,
    )


def _true_spectrum(token_lists: list[list[str]]) -> dict[int, tuple[int, int, int]]:
    """width -> (total, distinct, repeated) by REAL tuple counting —
    independent of the md5 doubling chain entirely."""
    from collections import Counter

    out = {}
    width = 1
    for _ in range(REPEAT_LEVELS):
        c: Counter = Counter()
        for toks in token_lists:
            for i in range(len(toks) - width + 1):
                c[tuple(toks[i : i + width])] += 1
        out[width] = (
            sum(c.values()),
            len(c),
            sum(v for v in c.values() if v > 1),
        )
        width *= 2
    return out


def test_matches_true_tuple_counting(spark, sf_correct):
    """The md5 doubling chain must equal true token-tuple counting on
    the fixture — pins the windowing arithmetic (never crossing doc
    boundaries, exact pos+width shifts) AND certifies zero hash
    collisions at fixture scale."""
    from bigdata_infra_cs489_spark.functions.text import tokenize
    from bigdata_infra_cs489_spark.sources.tables import load
    import pyspark.sql.functions as F

    docs = (
        load(spark, sf_correct, "documents")
        .select(tokenize("text").alias("toks"))
        .collect()
    )
    truth = _true_spectrum([list(r.toks) for r in docs])
    got = {
        r.width: (r.total_positions, r.distinct_contexts, r.repeated_positions)
        for r in repeat_spectrum(spark, sf_correct).collect()
    }
    assert got == truth


def test_crafted_corpus_exact_values(spark, tmp_path):
    """Hand-checkable frame: repeats at widths 1-4 only, none at 8+;
    windows never bridge the two documents."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [
            (0, "a b c d a b c d", "en", "s"),
            (1, "a b c d x y z w", "en", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    d = str(tmp_path / "sf")
    import os

    os.makedirs(d, exist_ok=True)
    df.write.parquet(f"{d}/documents.parquet")
    rows = {r.width: r for r in repeat_spectrum(spark, d).collect()}
    # width 1: 16 positions, ids a-d,x,y,z,w; a,b,c,d appear 3x each
    assert rows[1].total_positions == 16
    assert rows[1].distinct_contexts == 8
    assert rows[1].repeated_positions == 12
    # width 4: doc0 windows: abcd,bcda,cdab,dabc,abcd; doc1: abcd + 4
    # distinct -> "abcd" occurs 3x (twice in doc0, once in doc1)
    assert rows[4].total_positions == 10
    assert rows[4].repeated_positions == 3
    # width 8: each doc has exactly one window, and they differ
    assert rows[8].total_positions == 2
    assert rows[8].repeated_positions == 0
    # widths beyond doc length: empty level, ppm guard holds
    assert rows[16].total_positions == 0
    assert rows[16].repeated_ppm == 0
