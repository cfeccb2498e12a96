"""Content-defined chunking dedup vs an inline DuckDB oracle AND a
pure-Python replay of the cut rule, plus the shift-robustness property
fixed windows lack (single-sourced in plans/catalog.py since round-9 registration)."""

from __future__ import annotations

import hashlib
import re

from bigdata_infra_cs489_spark.operators.dedup import (
    CDC_MOD,
    cdc_chunk_stats,
    cdc_chunks,
)

from .oracle import assert_matches_oracle


def _stats_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["cdc_chunk_stats"]


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        cdc_chunk_stats(spark, sf_correct), _stats_sql(), sf_correct
    )


def _py_tokenize(text: str) -> list[str]:
    toks = re.split("[ \t\n\x0b\f\r]+", text.lower())
    toks = [re.sub("(^[^a-z]+|[^a-z]+$)", "", t) for t in toks]
    return [t for t in toks if t]


def _py_h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_chunks(text: str) -> list[list[str]]:
    toks = _py_tokenize(text)
    out: list[list[str]] = []
    cur: list[str] = []
    for t in toks:
        cur.append(t)
        if _py_h8(t) % CDC_MOD == 0:
            out.append(cur)
            cur = []
    if cur:
        out.append(cur)
    return out


def test_cut_rule_matches_python(spark, sf_smoke):
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    expected = {
        (d, i): " ".join(c)
        for d, t in texts.items()
        for i, c in enumerate(_py_chunks(t))
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id bigint, text string"
    )
    got = {
        (r["doc_id"], r["chunk_no"]): r["chunk"]
        for r in cdc_chunks(docs).collect()
    }
    assert got == expected


def test_cdc_is_shift_robust(spark):
    """The property CDC buys over fixed windows: prepending one token
    re-cuts at most the FIRST chunk; every later chunk is unchanged, so
    the duplicated tail still dedups. Fixed token windows shift every
    window boundary and find zero duplicate segments on the same pair."""
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambdaa "
        "mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    )
    docs = spark.createDataFrame(
        [(1, base), (2, "zzz " + base)], "doc_id bigint, text string"
    )
    chunks = {
        (r["doc_id"], r["chunk_no"]): r["chunk"]
        for r in cdc_chunks(docs).collect()
    }
    c1 = [v for (d, _), v in sorted(chunks.items()) if d == 1]
    c2 = [v for (d, _), v in sorted(chunks.items()) if d == 2]
    assert len(c1) > 2, "fixture text must produce several chunks"
    # all but the first chunk of doc 2 must appear verbatim in doc 1
    assert c2[1:] == c1[1:]
