"""source_mixture_plan vs an inline DuckDB oracle (integer-scaled pow
weights, the lang_temperature_rates twin on the source axis) and a
pure-Python replay of the budget/epochs arithmetic (staged for round-9
registration per the window contract)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.sampling import (
    MIX_ALPHA,
    MIX_TRAIN_BUDGET,
    source_mixture_plan,
)

from .oracle import assert_matches_oracle


def _plan_sql() -> str:
    from bigdata_infra_cs489_spark.plans.catalog import _TEXT_QUALITY_SQL

    return f"""
    WITH tq AS ({_TEXT_QUALITY_SQL}),
    per_src AS (
        SELECT d.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(coalesce(sum(tq.n_tokens), 0) AS BIGINT) AS total_tokens
        FROM documents d JOIN tq USING (doc_id)
        GROUP BY d.source),
    w AS (
        SELECT *,
               CASE WHEN total_tokens > 0
                    THEN CAST(floor(pow(total_tokens, {MIX_ALPHA}) * 1000000
                                    + 0.5) AS BIGINT)
                    ELSE 0 END AS wi
        FROM per_src),
    tot AS (SELECT sum(total_tokens) AS grand, sum(wi) AS s FROM w),
    shares AS (
        SELECT w.source, w.n_docs, w.total_tokens,
               CASE WHEN w.total_tokens > 0
                    THEN round(CAST(w.total_tokens AS DOUBLE)
                               / CAST(tot.grand AS DOUBLE), 6)
                    ELSE 0.0 END AS p_raw,
               CASE WHEN w.total_tokens > 0
                    THEN round(CAST(w.wi AS DOUBLE) / CAST(tot.s AS DOUBLE), 6)
                    ELSE 0.0 END AS p_temp
        FROM w, tot)
    SELECT source, n_docs, total_tokens, p_raw, p_temp,
           CAST(floor(p_temp * {MIX_TRAIN_BUDGET} + 0.5) AS BIGINT)
               AS draw_tokens,
           CASE WHEN total_tokens > 0
                THEN CAST((CAST(floor(p_temp * {MIX_TRAIN_BUDGET} + 0.5)
                                AS BIGINT) * 1000000 + total_tokens // 2)
                          // total_tokens AS BIGINT)
                ELSE 0 END AS epochs_micro
    FROM shares
    """


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        source_mixture_plan(spark, sf_correct), _plan_sql(), sf_correct
    )


def test_plan_arithmetic_replay(spark, sf_smoke):
    """Python replay + the mixing invariants: temperature flattens the
    distribution (largest source's share shrinks, smallest grows), the
    draw totals ~budget (off only by per-source rounding), and epochs
    agree with draw/available."""
    import math

    rows = sorted(
        source_mixture_plan(spark, sf_smoke).collect(),
        key=lambda r: r["source"],
    )
    assert rows
    grand = sum(r["total_tokens"] for r in rows)
    wis = [
        int(math.floor(r["total_tokens"] ** MIX_ALPHA * 1e6 + 0.5))
        for r in rows
    ]
    s = sum(wis)
    for r, wi in zip(rows, wis):
        p_temp = math.floor(wi / s * 1e6 + 0.5) / 1e6 if s else 0.0
        assert abs(r["p_temp"] - p_temp) < 2e-6, r["source"]
        draw = int(math.floor(r["p_temp"] * MIX_TRAIN_BUDGET + 0.5))
        assert r["draw_tokens"] == draw
        want_epochs = (draw * 1_000_000 + r["total_tokens"] // 2) // r[
            "total_tokens"
        ]
        assert r["epochs_micro"] == want_epochs
    total_draw = sum(r["draw_tokens"] for r in rows)
    assert abs(total_draw - MIX_TRAIN_BUDGET) <= len(rows)
    big = max(rows, key=lambda r: r["total_tokens"])
    small = min(rows, key=lambda r: r["total_tokens"])
    if big["total_tokens"] > small["total_tokens"]:
        assert big["p_temp"] < big["p_raw"] or big["p_raw"] == big["p_temp"]
        assert small["p_temp"] > small["p_raw"] or small["p_raw"] == small["p_temp"]
