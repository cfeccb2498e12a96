"""token_drift_report (old-vs-new-batch distribution drift card) vs an
inline DuckDB oracle AND a pure-Python replay, plus a crafted-shift
signal test (single-sourced in plans/catalog.py since round-9 registration)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pyarrow.parquet as pq

from bigdata_infra_cs489_spark.operators.dsir import (
    DRIFT_BUCKET_PPM,
    DSIR_BUCKETS,
    token_drift_report,
)

from .oracle import assert_matches_oracle


def _drift_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["token_drift_report"]


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        token_drift_report(spark, sf_correct), _drift_sql(), sf_correct
    )


def _py_tokenize(text: str) -> list[str]:
    toks = re.split("[ \t\n\x0b\f\r]+", text.lower())
    toks = [re.sub("(^[^a-z]+|[^a-z]+$)", "", t) for t in toks]
    return [t for t in toks if t]


def _py_h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_matches_python_replay(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.dedup import NEW_BATCH_MOD

    tbl = pq.read_table(f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"])
    old: Counter = Counter()
    new: Counter = Counter()
    for d, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        side = new if d % NEW_BATCH_MOD == NEW_BATCH_MOD - 1 else old
        side.update(_py_h8(w) % DSIR_BUCKETS for w in _py_tokenize(t))
    n_old, n_new = sum(old.values()), sum(new.values())
    tvd = js = shifted = 0
    for b in range(DSIR_BUCKETS):
        p, q = old.get(b, 0) / n_old, new.get(b, 0) / n_new
        if p == q == 0.0:
            continue
        if int(math.floor(abs(p - q) * 1e6 + 0.5)) >= DRIFT_BUCKET_PPM:
            shifted += 1
        tvd += int(math.floor(abs(p - q) * 0.5 * 1e6 + 0.5))
        t = (0.5 * p * math.log(p / ((p + q) / 2)) if p else 0.0) + (
            0.5 * q * math.log(q / ((p + q) / 2)) if q else 0.0
        )
        js += int(math.floor(t * 1e6 + 0.5))
    r = token_drift_report(spark, sf_smoke).collect()[0]
    assert (
        r["n_old_tokens"],
        r["n_new_tokens"],
        r["tvd_micro"],
        r["js_micro"],
        r["n_shifted_buckets"],
    ) == (n_old, n_new, tvd, js, shifted)
    # sanity: distances live in their theoretical ranges (micro units;
    # per-bucket rounding adds at most 1 micro per bucket)
    assert 0 <= r["tvd_micro"] <= 1_000_000 + DSIR_BUCKETS
    assert 0 <= r["js_micro"] <= int(math.log(2) * 1e6) + DSIR_BUCKETS
