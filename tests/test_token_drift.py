"""token_drift_report (old-vs-new-batch distribution drift card) vs an
inline DuckDB oracle AND a pure-Python replay, plus a crafted-shift
signal test (staged for round-9 registration per the window contract)."""

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
    from bigdata_infra_cs489_spark.operators.dedup import NEW_BATCH_MOD
    from bigdata_infra_cs489_spark.plans.catalog import DUCK_H8, DUCK_TOKS

    new_pred = f"doc_id % {NEW_BATCH_MOD} = {NEW_BATCH_MOD - 1}"
    return f"""
    WITH toks AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents),
    words AS (SELECT doc_id, unnest(toks) AS word FROM toks),
    b AS (SELECT CASE WHEN {new_pred} THEN 1 ELSE 0 END AS side,
                 {DUCK_H8.format(x='word')} % {DSIR_BUCKETS} AS bucket
          FROM words),
    c AS (SELECT side, bucket, count(*) AS n FROM b GROUP BY side, bucket),
    tot AS (SELECT
                CAST(coalesce(sum(CASE WHEN side = 0 THEN n END), 0)
                     AS BIGINT) AS n_old,
                CAST(coalesce(sum(CASE WHEN side = 1 THEN n END), 0)
                     AS BIGINT) AS n_new
            FROM c),
    pq_tbl AS (
        SELECT g.bucket,
               coalesce(o.n, 0) / CAST(tot.n_old AS DOUBLE) AS p,
               coalesce(w.n, 0) / CAST(tot.n_new AS DOUBLE) AS q
        FROM (SELECT unnest(range(0, {DSIR_BUCKETS})) AS bucket) g
        LEFT JOIN (SELECT bucket, n FROM c WHERE side = 0) o USING (bucket)
        LEFT JOIN (SELECT bucket, n FROM c WHERE side = 1) w USING (bucket),
        tot
        WHERE tot.n_old > 0 AND tot.n_new > 0
          AND (coalesce(o.n, 0) > 0 OR coalesce(w.n, 0) > 0)),
    terms AS (
        SELECT CAST(floor(abs(p - q) * 1000000 + 0.5) AS BIGINT) AS d,
               CAST(floor(abs(p - q) * 0.5 * 1000000 + 0.5) AS BIGINT)
                   AS tvd_t,
               CAST(floor((CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p+q)/2))
                                ELSE 0 END
                           + CASE WHEN q > 0 THEN 0.5 * q * ln(q / ((p+q)/2))
                                  ELSE 0 END) * 1000000 + 0.5) AS BIGINT)
                   AS js_t
        FROM pq_tbl)
    SELECT tot.n_old AS n_old_tokens, tot.n_new AS n_new_tokens,
           CAST(coalesce((SELECT sum(tvd_t) FROM terms), 0) AS BIGINT)
               AS tvd_micro,
           CAST(coalesce((SELECT sum(js_t) FROM terms), 0) AS BIGINT)
               AS js_micro,
           CAST(coalesce((SELECT sum(CASE WHEN d >= {DRIFT_BUCKET_PPM}
                                          THEN 1 END) FROM terms), 0)
                AS BIGINT) AS n_shifted_buckets
    FROM tot
    """


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
