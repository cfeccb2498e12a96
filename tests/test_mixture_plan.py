"""source_mixture_plan vs an inline DuckDB oracle (integer-scaled pow
weights, the lang_temperature_rates twin on the source axis) and a
pure-Python replay of the budget/epochs arithmetic (single-sourced in plans/catalog.py since round-9 registration)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.sampling import (
    MIX_ALPHA,
    MIX_TRAIN_BUDGET,
    source_mixture_plan,
)

from .oracle import assert_matches_oracle


def _plan_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["source_mixture_plan"]


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
