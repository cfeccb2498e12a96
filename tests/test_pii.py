"""PII scan/redact vs an inline DuckDB oracle AND a pure-Python `re`
reimplementation (staged for round-7 registration, the DSIR discipline:
fully value-verified here; register() + driver-window slot follow next
rotation so the window contract stays exact)."""

from __future__ import annotations

import re

import pyarrow.parquet as pq

from bigdata_infra_cs489_spark.operators.pii import (
    PII_PATTERNS,
    pii_redact,
    pii_stats,
)

from .oracle import assert_matches_oracle

# The decoration expression, mirrored byte-for-byte from
# operators/pii.py::decorate_with_pii (suffixes append in when-order).
_DECORATED = """
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 3 = 0
                THEN ' Contact user' || CAST(doc_id AS VARCHAR)
                     || '@example.com now.' ELSE '' END
           || CASE WHEN doc_id % 4 = 0
                THEN ' Call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                     || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     || '.' ELSE '' END
           || CASE WHEN doc_id % 5 = 0
                THEN ' SSN 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     || '.' ELSE '' END
           || CASE WHEN doc_id % 6 = 0
                THEN ' Card 4111 1111 1111 '
                     || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     || '.' ELSE '' END
           || CASE WHEN doc_id % 7 = 0
                THEN ' Host 10.' || CAST(doc_id % 200 AS VARCHAR)
                     || '.' || CAST(doc_id % 250 AS VARCHAR)
                     || '.' || CAST(doc_id % 100 + 1 AS VARCHAR)
                     || '.' ELSE '' END
           AS text
    FROM documents
"""

_COUNT_COLS = ",\n".join(
    f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{cat}"
    for cat, pat, _ in PII_PATTERNS
)
_TOTAL = " + ".join(f"n_{cat}" for cat, _, _ in PII_PATTERNS)

_STATS_SQL = f"""
    WITH dec AS ({_DECORATED}),
    c AS (SELECT doc_id, {_COUNT_COLS} FROM dec)
    SELECT *, CAST({_TOTAL} AS BIGINT) AS n_total
    FROM c WHERE {_TOTAL} > 0
"""


def _staged_redact() -> tuple[list[str], str]:
    """Mirror redact_pii's staged chain: each category's count is taken
    on the text with all earlier categories already replaced, so the sum
    is the actual substitution count."""
    expr = "text"
    counts = []
    for _, pat, ph in PII_PATTERNS:
        counts.append(f"len(regexp_extract_all({expr}, '{pat}'))")
        expr = f"regexp_replace({expr}, '{pat}', '{ph}', 'g')"
    return counts, expr


_STAGED_COUNTS, _CLEAN_EXPR = _staged_redact()

_REDACT_SQL = f"""
    WITH dec AS ({_DECORATED}),
    r AS (SELECT doc_id,
                 {_CLEAN_EXPR} AS clean_text,
                 CAST({" + ".join(_STAGED_COUNTS)}
                      AS BIGINT) AS n_redactions
          FROM dec)
    SELECT * FROM r WHERE n_redactions > 0
"""


def test_stats_match_oracle(spark, sf_correct):
    assert_matches_oracle(pii_stats(spark, sf_correct), _STATS_SQL, sf_correct)


def test_redact_matches_oracle(spark, sf_correct):
    assert_matches_oracle(pii_redact(spark, sf_correct), _REDACT_SQL, sf_correct)


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
