"""Log-space probability arithmetic vs NumPy logaddexp."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_log_add_exp_matches_numpy(spark):
    from bigdata_infra_cs489_spark.functions.numerics import log_add_exp

    cases = [
        (-1.0, -2.0),
        (-700.0, -700.5),  # exp underflows in linear float64
        (-1e5, -1e5 + 1),
        (float("-inf"), -3.0),
        (-3.0, float("-inf")),
        (float("-inf"), float("-inf")),
        (0.0, 0.0),
    ]
    df = spark.createDataFrame(cases, "a double, b double")
    got = [r["r"] for r in df.select(log_add_exp(F.col("a"), F.col("b")).alias("r")).collect()]
    want = [np.logaddexp(a, b) for a, b in cases]
    for g, w in zip(got, want):
        if math.isinf(w):
            assert math.isinf(g) and g < 0
        else:
            assert g == pytest.approx(w, rel=1e-12)


def test_sum_log_probs_matches_numpy(spark):
    from bigdata_infra_cs489_spark.functions.numerics import sum_log_probs

    rng = np.random.default_rng(7)
    rows = [
        [float(x) for x in rng.uniform(-800, -700, size=8)],
        [float(x) for x in rng.uniform(-5, 0, size=5)],
        [float("-inf")] * 3,
        [-1000.0],
    ]
    df = spark.createDataFrame([(v,) for v in rows], "v array<double>")
    got = [r["r"] for r in df.select(sum_log_probs(F.col("v")).alias("r")).collect()]
    for g, vals in zip(got, rows):
        w = np.logaddexp.reduce(np.array(vals))
        if math.isinf(w):
            assert math.isinf(g) and g < 0
        else:
            assert g == pytest.approx(float(w), rel=1e-12)


def test_underflow_regime_where_linear_space_fails(spark):
    """The motivating case: linear-space float64 rounds e^-800 to 0, the
    log-space aggregate keeps full precision."""
    from bigdata_infra_cs489_spark.functions.numerics import sum_log_probs

    df = spark.createDataFrame([([-800.0, -800.0],)], "v array<double>")
    linear = df.select(
        F.log(
            F.aggregate("v", F.lit(0.0), lambda acc, x: acc + F.exp(x))
        ).alias("r")
    ).collect()[0]["r"]
    stable = df.select(sum_log_probs(F.col("v")).alias("r")).collect()[0]["r"]
    assert linear is None or math.isinf(linear)  # log(0) -> null/-inf: broken
    assert stable == pytest.approx(-800.0 + math.log(2), rel=1e-12)


def test_null_and_empty_edges(spark):
    """NULL operands propagate NULL (least/greatest would otherwise skip
    them and fabricate x + ln 2); an empty array sums to -inf."""
    import math

    from pyspark.sql import functions as F

    from bigdata_infra_cs489_spark.functions.numerics import (
        log_add_exp,
        sum_log_probs,
    )

    df = spark.range(1)
    null_d = F.lit(None).cast("double")
    r = df.select(
        log_add_exp(F.lit(0.0), null_d).alias("a"),
        log_add_exp(null_d, F.lit(-3.0)).alias("b"),
        sum_log_probs(F.array().cast("array<double>")).alias("c"),
    ).collect()[0]
    assert r["a"] is None and r["b"] is None
    assert math.isinf(r["c"]) and r["c"] < 0
