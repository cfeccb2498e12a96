"""Salted-join equivalence and the rank-based AUC metric."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_salted_join_equals_plain_join(spark):
    """On a deliberately skewed key distribution (90% one key), the salted
    join returns exactly the plain join's rows."""
    from bigdata_infra_cs489_spark.functions.skew import salted_join

    large = spark.range(0, 2000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 7).alias("k"),
    )
    small = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(7)], "k long, name string"
    )
    plain = large.join(small, "k").select("row_id", "k", "name")
    salted = salted_join(large, small, "k", n_salts=8).select("row_id", "k", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    from bigdata_infra_cs489_spark.functions.skew import salted_join

    large = spark.createDataFrame([(1, 10), (2, 20), (99, 30)], "k long, v long")
    small = spark.createDataFrame([(1, "a"), (2, "b")], "k long, name string")
    got = {
        (r["k"], r["name"])
        for r in salted_join(large, small, "k", n_salts=4, how="left").collect()
    }
    assert got == {(1, "a"), (2, "b"), (99, None)}


def test_ranking_auc_matches_numpy(spark, sf_correct):
    """Spark window-based AUC (with tie-averaged ranks) equals a NumPy
    Mann-Whitney computation on the same scores."""
    import numpy as np

    from bigdata_infra_cs489_spark.operators.ml import (
        apply_spam_classifier,
        ranking_auc,
    )

    scored = apply_spam_classifier(spark, sf_correct)
    rows = scored.collect()
    y = np.array([1 if r["label"] == "spam" else 0 for r in rows])
    s = np.array([r["score"] for r in rows], dtype=np.float64)

    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s), dtype=np.float64)
    sorted_s = s[order]
    i = 0
    while i < len(s):
        j = i
        while j + 1 < len(s) and sorted_s[j + 1] == sorted_s[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + 1 + j + 1) / 2.0
        i = j + 1
    n_pos, n_neg = int(y.sum()), int((1 - y).sum())
    want_auc = (ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)

    got = ranking_auc(scored).collect()[0]
    assert got["n_pos"] == n_pos and got["n_neg"] == n_neg
    assert got["auc"] == pytest.approx(round(want_auc, 6), abs=1e-9)
    assert got["roca_pct"] == pytest.approx(round((1 - want_auc) * 100, 4), abs=1e-6)


def test_auc_extremes_and_ties(spark):
    """Perfectly separated scores give AUC 1.0; all-tied scores give 0.5.
    (The fixture's labels are doc_id%3 — noise w.r.t. the text — so the
    trained model's AUC is checked against NumPy above, not a threshold.)"""
    from bigdata_infra_cs489_spark.operators.ml import ranking_auc

    sep = spark.createDataFrame(
        [("spam", 10.0 + i) for i in range(5)] + [("ham", float(i)) for i in range(5)],
        "label string, score double",
    )
    assert ranking_auc(sep).collect()[0]["auc"] == 1.0

    tied = spark.createDataFrame(
        [("spam", 1.0)] * 4 + [("ham", 1.0)] * 6, "label string, score double"
    )
    assert ranking_auc(tied).collect()[0]["auc"] == 0.5


def test_boilerplate_fraction_salted_on_hot_shingle_fixture(spark):
    """A corpus where one shingle appears in EVERY doc (the worst-case
    hot join key): the salted path must (a) return exactly the plain-join
    result and (b) actually spread the hot key's rows across salts with a
    bounded max/expected task-size ratio — the property that keeps one
    reducer from absorbing the whole hot key at scale."""
    from bigdata_infra_cs489_spark.functions.skew import salt_column
    from bigdata_infra_cs489_spark.operators.dedup import (
        SHINGLE_N,
        boilerplate_fraction,
        shingle_index,
    )

    n_docs, n_salts = 200, 8
    hot = "alpha beta gamma"  # SHINGLE_N=3: one shared 3-gram per doc
    corpus = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(hot + " unique"),
            F.col("id").cast("string"),
            F.lit(" filler"),
            (F.col("id") * 7 % 13).cast("string"),
        ).alias("text"),
    )

    plain = sorted(
        map(tuple, boilerplate_fraction(corpus, n_salts=1).collect())
    )
    salted = sorted(
        map(tuple, boilerplate_fraction(corpus, n_salts=n_salts).collect())
    )
    assert plain == salted
    # every doc contains the hot shingle -> boiler_frac > 0 everywhere
    assert all(row[3] > 0 for row in salted)

    # spread check: the hot shingle's rows land in every salt bucket and
    # no bucket exceeds 2x the uniform share
    sh = shingle_index(corpus, SHINGLE_N)
    hot_rows = sh.where(F.col("s") == hot).withColumn(
        "_salt", salt_column(["s"], n_salts)
    )
    sizes = {
        r["_salt"]: r["cnt"]
        for r in hot_rows.groupBy("_salt").agg(F.count("*").alias("cnt")).collect()
    }
    assert len(sizes) == n_salts
    assert max(sizes.values()) <= 2 * (n_docs / n_salts)


def test_salted_join_rejects_right_and_full(spark):
    import pytest

    from bigdata_infra_cs489_spark.functions.skew import salted_join

    large = spark.createDataFrame([(1, 10)], "k long, v long")
    small = spark.createDataFrame([(1, "a")], "k long, name string")
    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError):
            salted_join(large, small, "k", how=how)


def test_shuffled_hash_join_skewed_build_is_exact(spark):
    """Blast-radius pin for session.py's preferSortMergeJoin=false
    (round-15 optimization): a shuffle join whose build side carries a
    hot key (90% of rows on one value) must (a) actually plan as
    ShuffledHashJoin under the engine session, and (b) produce exactly
    the rows of the forced sort-merge plan — SHJ's build side does not
    spill, so this pins that the planner's size bound keeps flipped
    joins correct under skew rather than trusting the conf blindly."""
    from pyspark.sql import functions as F

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # suppress broadcast (build estimates ~hundreds of KB) while keeping
    # the SHJ local-map bound (partitions x threshold) well above it
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024))
    try:
        stream = spark.range(0, 500_000).select(
            (F.col("id") % 1000).alias("k"), F.col("id").alias("rid")
        )
        build = spark.range(0, 20_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            (F.col("id") * 3).alias("v"),
        )
        flipped = stream.join(build, "k")
        plan = flipped._jdf.queryExecution().executedPlan().toString()
        assert "ShuffledHashJoin" in plan, plan
        merged = stream.join(build.hint("merge"), "k")
        mplan = merged._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in mplan, mplan
        agg = lambda df: sorted(
            map(
                tuple,
                df.groupBy("k")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
                .collect(),
            )
        )
        assert agg(flipped) == agg(merged)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
