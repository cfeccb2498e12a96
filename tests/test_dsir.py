"""DSIR importance scoring vs the registered DuckDB oracle
(single-sourced in plans/catalog.py since round-7 registration) AND a
pure-Python reimplementation."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pyarrow.parquet as pq

from bigdata_infra_cs489_spark.operators.dsir import (
    DSIR_BUCKETS,
    DSIR_TARGET_MOD,
    DSIR_TOP_K,
    dsir_scores,
    dsir_topk,
)

from .oracle import assert_matches_oracle

def test_scores_match_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    assert_matches_oracle(
        dsir_scores(spark, sf_correct),
        entrymod.oracle_sql()["dsir_scores"],
        sf_correct,
    )


def test_topk_matches_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    assert_matches_oracle(
        dsir_topk(spark, sf_correct),
        entrymod.oracle_sql()["dsir_topk"],
        sf_correct,
    )


def _py_tokenize(text: str) -> list[str]:
    toks = re.split("[ \t\n\x0b\f\r]+", text.lower())
    toks = [re.sub("(^[^a-z]+|[^a-z]+$)", "", t) for t in toks]
    return [t for t in toks if t]


def _py_h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_against_python_reimplementation(spark, sf_smoke):
    """Full chain (hash-bucket counts -> smoothed micro-nat log ratios ->
    exact integer doc scores) against an independent Python
    implementation, plus the selection invariants."""
    tbl = pq.read_table(f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    buckets = {
        d: Counter(_py_h8(w) % DSIR_BUCKETS for w in _py_tokenize(t))
        for d, t in texts.items()
    }
    tcnt: Counter = Counter()
    rcnt: Counter = Counter()
    for d, c in buckets.items():
        (tcnt if d % DSIR_TARGET_MOD == 0 else rcnt).update(c)
    T, R = sum(tcnt.values()), sum(rcnt.values())
    lr = {
        b: int(
            math.floor(
                (
                    math.log((tcnt.get(b, 0) + 1) / (T + DSIR_BUCKETS))
                    - math.log((rcnt.get(b, 0) + 1) / (R + DSIR_BUCKETS))
                )
                * 1e6
                + 0.5
            )
        )
        for b in range(DSIR_BUCKETS)
    }
    expected = {}
    for d, c in buckets.items():
        if d % DSIR_TARGET_MOD == 0:
            continue
        n = sum(c.values())
        s = sum(cnt * lr[b] for b, cnt in c.items())
        # floor-micro finish (round-12): score/n is an integer ratio,
        # so exact .5-micro ties occur and engine round() tie-breaks
        # diverge; floor(x + 0.5) is the shared deterministic form
        expected[d] = (n, s, math.floor(s / max(n, 1) + 0.5) / 1e6)
    # docs tokenizing to zero tokens still appear, scored 0
    for d in texts:
        if d % DSIR_TARGET_MOD != 0:
            expected.setdefault(d, (0, 0, 0.0))

    got = {
        r.doc_id: (r.n_tokens, r.score_micro, r.avg_logratio)
        for r in dsir_scores(spark, sf_smoke).collect()
    }
    assert got == expected

    top = dsir_topk(spark, sf_smoke).collect()
    assert len(top) == min(DSIR_TOP_K, len(expected))
    order = sorted(
        expected, key=lambda d: (-expected[d][2], d)
    )[: len(top)]
    assert [r.doc_id for r in sorted(top, key=lambda r: r.rank)] == order
    assert all(r.doc_id % DSIR_TARGET_MOD != 0 for r in top)


# --- importance resampling (staged for round-8 registration) ----------------

def _resample_sql(k: int) -> str:
    from bigdata_infra_cs489_spark.operators.dsir import DSIR_GUMBEL_SALT
    from bigdata_infra_cs489_spark.plans.catalog import DUCK_DSIR_SCORES

    h = _H8.format(x=f"CAST(doc_id AS VARCHAR) || '{DSIR_GUMBEL_SALT}'")
    return f"""
    WITH s AS ({DUCK_DSIR_SCORES}),
    keyed AS (SELECT *,
                     round(score_micro / 1000000.0
                           - ln(-ln((({h}) % 1000000 + 0.5) / 1000000.0)),
                           6) AS gumbel_key
              FROM s),
    top AS (SELECT doc_id, n_tokens, avg_logratio, gumbel_key FROM keyed
            ORDER BY gumbel_key DESC, doc_id LIMIT {k})
    SELECT CAST(row_number() OVER (ORDER BY gumbel_key DESC, doc_id)
                AS INT) AS rank,
           doc_id, n_tokens, avg_logratio, gumbel_key
    FROM top
    """


_H8 = "CAST(('0x' || substr(md5({x}), 1, 8)) AS BIGINT)"


def test_resample_matches_oracle(spark, sf_correct):
    from bigdata_infra_cs489_spark.operators.dsir import (
        DSIR_RESAMPLE_K,
        dsir_resample,
    )

    assert_matches_oracle(
        dsir_resample(spark, sf_correct), _resample_sql(DSIR_RESAMPLE_K), sf_correct
    )


def test_resample_against_python(spark, sf_smoke):
    """Gumbel-top-k draw against an independent Python implementation:
    deterministic uniforms from the salted hash, shared-libm logs, exact
    (key desc, doc_id) order; the sample must also be raw-side only with
    dense unique ranks."""
    from bigdata_infra_cs489_spark.operators.dsir import (
        DSIR_GUMBEL_SALT,
        DSIR_RESAMPLE_K,
        dsir_resample,
    )

    tbl = pq.read_table(f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    buckets = {
        d: Counter(_py_h8(w) % DSIR_BUCKETS for w in _py_tokenize(t))
        for d, t in texts.items()
    }
    tcnt: Counter = Counter()
    rcnt: Counter = Counter()
    for d, c in buckets.items():
        (tcnt if d % DSIR_TARGET_MOD == 0 else rcnt).update(c)
    T, R = sum(tcnt.values()), sum(rcnt.values())
    lr = {
        b: int(
            math.floor(
                (
                    math.log((tcnt.get(b, 0) + 1) / (T + DSIR_BUCKETS))
                    - math.log((rcnt.get(b, 0) + 1) / (R + DSIR_BUCKETS))
                )
                * 1e6
                + 0.5
            )
        )
        for b in range(DSIR_BUCKETS)
    }

    def _r6(x: float) -> float:
        return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6

    keys = {}
    for d in texts:
        if d % DSIR_TARGET_MOD == 0:
            continue
        s = sum(cnt * lr[b] for b, cnt in buckets[d].items())
        u = (_py_h8(f"{d}{DSIR_GUMBEL_SALT}") % 1_000_000 + 0.5) / 1e6
        keys[d] = _r6(s / 1e6 - math.log(-math.log(u)))

    want = sorted(keys, key=lambda d: (-keys[d], d))[:DSIR_RESAMPLE_K]
    got = sorted(
        dsir_resample(spark, sf_smoke).collect(), key=lambda r: r.rank
    )
    assert [r.doc_id for r in got] == want
    assert [r.rank for r in got] == list(range(1, len(got) + 1))
    assert all(r.doc_id % DSIR_TARGET_MOD != 0 for r in got)
    for r in got:
        assert abs(r.gumbel_key - keys[r.doc_id]) < 1e-9, r.doc_id


def test_standing_dsir_scores_match_inline(spark, sf_correct):
    """The standing weight table must equal the inline scoring lineage
    exactly (int64 score_micro/n_tokens; floor-micro avg_logratio), so a
    missed DSIR_SCORES_VERSION bump after a scoring-affecting change
    fails here before any oracle row does."""
    from bigdata_infra_cs489_spark.operators.dsir import (
        dsir_scores,
        standing_dsir_scores,
    )

    cols = ["doc_id", "n_tokens", "score_micro", "avg_logratio"]
    inline = sorted(
        tuple(r[c] for c in cols)
        for r in dsir_scores(spark, sf_correct).collect()
    )
    asset = sorted(
        tuple(r[c] for c in cols)
        for r in standing_dsir_scores(spark, sf_correct).collect()
    )
    assert len(inline) > 0
    assert asset == inline


def test_dsir_selection_rides_standing_scores(spark, sf_smoke):
    """Once the weight table exists, the selection/resample cards must
    PROBE it (a dsirscores_v* parquet scan) rather than re-scoring the
    corpus per query."""
    import os

    import __spark_entry__ as entrymod

    from bigdata_infra_cs489_spark.operators.dsir import (
        dsir_scores_path,
        standing_dsir_scores,
    )

    standing_dsir_scores(spark, sf_smoke).count()  # ensure built
    sub = os.path.join(dsir_scores_path(sf_smoke), "scores")
    assert os.path.exists(os.path.join(sub, "_SUCCESS"))
    for name in ("dsir_topk", "dsir_resample"):
        files = entrymod.queries()[name](spark, sf_smoke).inputFiles()
        assert any("dsirscores_v" in f for f in files), (
            f"{name} does not probe the weight table: {files}"
        )
        assert not any("documents.parquet" in f for f in files), name
