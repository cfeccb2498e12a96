"""PII scan/redact vs the registered DuckDB oracle (single-sourced in
plans/catalog.py since round-7 registration) AND a pure-Python `re`
reimplementation — a third engine agreeing on the RE2-safe pattern set's
match semantics."""

from __future__ import annotations

import re

import pyarrow.parquet as pq

from bigdata_infra_cs489_spark.operators.pii import (
    PII_PATTERNS,
    pii_redact,
    pii_stats,
)

from .oracle import assert_matches_oracle

def test_stats_match_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    assert_matches_oracle(
        pii_stats(spark, sf_correct),
        entrymod.oracle_sql()["pii_stats"],
        sf_correct,
    )


def test_redact_matches_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    assert_matches_oracle(
        pii_redact(spark, sf_correct),
        entrymod.oracle_sql()["pii_redact"],
        sf_correct,
    )


def _py_decorate(doc_id: int, text: str) -> str:
    if doc_id % 3 == 0:
        text += f" Contact user{doc_id}@example.com now."
    if doc_id % 4 == 0:
        text += f" Call 555-{doc_id % 1000:03d}-{doc_id % 10000:04d}."
    if doc_id % 5 == 0:
        text += f" SSN 123-45-{doc_id % 10000:04d}."
    if doc_id % 6 == 0:
        text += f" Card 4111 1111 1111 {doc_id % 10000:04d}."
    if doc_id % 7 == 0:
        text += f" Host 10.{doc_id % 200}.{doc_id % 250}.{doc_id % 100 + 1}."
    return text


def test_against_python_reimplementation(spark, sf_smoke):
    """Counts and redacted text against Python's `re` on the same
    decorated corpus — a third engine agreeing on the RE2-safe pattern
    set's match semantics."""
    tbl = pq.read_table(f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"])
    texts = {
        d: _py_decorate(d, t)
        for d, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
    }

    expected_counts = {}
    expected_clean = {}
    expected_nred = {}
    for d, t in texts.items():
        per = {cat: len(re.findall(pat, t)) for cat, pat, _ in PII_PATTERNS}
        if sum(per.values()) > 0:
            expected_counts[d] = per
            # staged: count on the progressively-replaced text, matching
            # redact_pii's actual-substitution semantics
            clean = t
            nred = 0
            for _, pat, ph in PII_PATTERNS:
                nred += len(re.findall(pat, clean))
                clean = re.sub(pat, ph, clean)
            expected_clean[d] = clean
            expected_nred[d] = nred

    got = {r["doc_id"]: r.asDict() for r in pii_stats(spark, sf_smoke).collect()}
    assert set(got) == set(expected_counts)
    for d, per in expected_counts.items():
        for cat in per:
            assert got[d][f"n_{cat}"] == per[cat], (d, cat)
        assert got[d]["n_total"] == sum(per.values())

    red = {r["doc_id"]: r for r in pii_redact(spark, sf_smoke).collect()}
    assert set(red) == set(expected_clean)
    for d, want in expected_clean.items():
        assert red[d]["clean_text"] == want, d
        assert red[d]["n_redactions"] == expected_nred[d]


def test_redacted_text_has_no_residual_pii(spark, sf_smoke):
    """Invariant: scanning the redacted text again finds nothing — the
    placeholder insertion cannot create new matches for any pattern."""
    for r in pii_redact(spark, sf_smoke).collect():
        for _, pat, _ in PII_PATTERNS:
            assert not re.search(pat, r["clean_text"]), (r["doc_id"], pat)
