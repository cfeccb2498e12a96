"""Corpus line-level dedup vs the registered DuckDB oracle
(single-sourced in plans/catalog.py since round-8 registration) AND a
pure-Python reimplementation, plus a crafted newline corpus for the
real-world segmenter and a fingerprint-path pinning test."""

from __future__ import annotations

import re

import pyarrow.parquet as pq

from bigdata_infra_cs489_spark.operators.linededup import (
    LINE_W,
    dedup_lines_keep_first,
    dup_line_report,
    dup_line_stats,
    line_dedup_corpus,
    newline_lines,
    token_window_lines,
)

from .oracle import assert_matches_oracle


def test_stats_match_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    assert_matches_oracle(
        dup_line_stats(spark, sf_correct),
        entrymod.oracle_sql()["dup_line_stats"],
        sf_correct,
    )


def test_dedup_matches_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    assert_matches_oracle(
        line_dedup_corpus(spark, sf_correct),
        entrymod.oracle_sql()["line_dedup_corpus"],
        sf_correct,
    )


def test_fingerprint_path_pins_to_string_path(spark, sf_correct):
    """The xxhash64 exchange shape must produce the IDENTICAL kept set
    and reassembled text as the oracle-checkable string path (the
    repeated_spans_fp playbook)."""
    from bigdata_infra_cs489_spark.sources.tables import load

    docs = load(spark, sf_correct, "documents").select("doc_id", "text")
    lines = token_window_lines(docs)
    a = {
        r["doc_id"]: (r["n_lines"], r["kept_lines"], r["clean_text"])
        for r in dedup_lines_keep_first(docs, lines).collect()
    }
    b = {
        r["doc_id"]: (r["n_lines"], r["kept_lines"], r["clean_text"])
        for r in dedup_lines_keep_first(
            docs, lines, use_fingerprints=True
        ).collect()
    }
    assert a == b


def _py_windows(text: str) -> list[str]:
    words = [w for w in re.split("[ \t\n\x0b\f\r]+", text) if w]
    return [
        " ".join(words[i : i + LINE_W]) for i in range(0, len(words), LINE_W)
    ]


def test_against_python_reimplementation(spark, sf_smoke):
    """Keep-first dedup against an independent Python implementation:
    exact (doc_id, line_no) arbitration, per-doc reassembly order, and
    the stats/dedup consistency invariant
    sum(n_lines - kept_lines) == removed_occurrences."""
    tbl = pq.read_table(f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))

    first: dict[str, tuple[int, int]] = {}
    for d in sorted(texts):
        for i, line in enumerate(_py_windows(texts[d])):
            first.setdefault(line, (d, i))
    expected = {}
    for d in sorted(texts):
        wins = _py_windows(texts[d])
        kept = [l for i, l in enumerate(wins) if first[l] == (d, i)]
        expected[d] = (len(wins), len(kept), " ".join(kept))

    got = {
        r["doc_id"]: (r["n_lines"], r["kept_lines"], r["clean_text"])
        for r in line_dedup_corpus(spark, sf_smoke).collect()
    }
    assert got == expected

    stats = dup_line_stats(spark, sf_smoke).collect()[0]
    assert stats["removed_occurrences"] == sum(
        n - k for n, k, _ in expected.values()
    )
    assert stats["n_lines"] == sum(n for n, _, _ in expected.values())
    assert stats["n_distinct_lines"] == len(first)


def test_crafted_newline_corpus(spark):
    """The real-world newline segmenter on a crafted corpus with
    cross-document boilerplate: the repeated banner keeps exactly its
    first occurrence, unique lines all survive, and reassembly preserves
    in-document order."""
    banner = "SUBSCRIBE TO OUR NEWSLETTER"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta\n{banner}\ngamma"),
            (2, f"{banner}\ndelta\n{banner}"),
            (3, "epsilon\nzeta"),
            (4, ""),
        ],
        "doc_id bigint, text string",
    )
    lines = newline_lines(docs)
    got = {
        r["doc_id"]: (r["n_lines"], r["kept_lines"], r["clean_text"])
        for r in dedup_lines_keep_first(docs, lines).collect()
    }
    assert got[1] == (3, 3, f"alpha beta {banner} gamma")
    assert got[2] == (3, 1, "delta")  # both banner copies are later dups
    assert got[3] == (2, 2, "epsilon zeta")
    assert got[4] == (1, 1, "")  # split('') -> [''] on both engines

    rep = dup_line_report(lines).collect()[0]
    assert rep["n_lines"] == 9
    assert rep["removed_occurrences"] == 2
    assert rep["dup_occurrences"] == 3

    # sep='\n' preserves the newline structure instead of flattening it
    nl = {
        r["doc_id"]: r["clean_text"]
        for r in dedup_lines_keep_first(docs, lines, sep="\n").collect()
    }
    assert nl[1] == f"alpha beta\n{banner}\ngamma"
    assert nl[3] == "epsilon\nzeta"


def test_empty_corpus_degrades_to_zero(spark):
    docs = spark.createDataFrame([], "doc_id bigint, text string")
    rep = dup_line_report(token_window_lines(docs)).collect()[0]
    assert (
        rep["n_lines"],
        rep["n_distinct_lines"],
        rep["removed_occurrences"],
        rep["dup_line_ppm"],
    ) == (0, 0, 0, 0)
    assert dedup_lines_keep_first(docs, token_window_lines(docs)).count() == 0


def test_incremental_matches_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    from bigdata_infra_cs489_spark.operators.linededup import (
        incremental_line_dedup,
    )

    assert_matches_oracle(
        incremental_line_dedup(spark, sf_correct),
        entrymod.oracle_sql()["incremental_line_dedup"],
        sf_correct,
    )


def test_incremental_consistency(spark, sf_smoke):
    """Invariants: only new-batch docs appear; dup_lines + kept text
    window count = n_lines; a new doc whose every window is novel keeps
    its full reassembled text."""
    from bigdata_infra_cs489_spark.operators.dedup import NEW_BATCH_MOD
    from bigdata_infra_cs489_spark.operators.linededup import (
        incremental_line_dedup,
    )

    rows = incremental_line_dedup(spark, sf_smoke).collect()
    assert rows, "smoke fixture must contain new-batch docs"
    for r in rows:
        assert r["doc_id"] % NEW_BATCH_MOD == NEW_BATCH_MOD - 1
        kept = len(_py_windows(r["clean_text"])) if r["clean_text"] else 0
        assert 0 <= r["dup_lines"] <= r["n_lines"]
        if r["dup_lines"] == 0 and r["n_lines"] > 0:
            assert kept == r["n_lines"]


def test_incremental_fingerprint_path_pins_to_string_path(spark, sf_correct):
    """The 8-byte-key standing-index probe must produce the IDENTICAL
    result as the oracle-checkable string probe."""
    from bigdata_infra_cs489_spark.operators.linededup import (
        incremental_line_dedup,
    )

    a = {
        r["doc_id"]: (r["n_lines"], r["dup_lines"], r["clean_text"])
        for r in incremental_line_dedup(spark, sf_correct).collect()
    }
    b = {
        r["doc_id"]: (r["n_lines"], r["dup_lines"], r["clean_text"])
        for r in incremental_line_dedup(
            spark, sf_correct, use_fingerprints=True
        ).collect()
    }
    assert a == b
