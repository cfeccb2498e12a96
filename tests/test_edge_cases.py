"""Edge-case behavior of the session's newer operators on degenerate
inputs: missing terms/types, empty sides, disjoint keys."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _patch_events(module, df):
    """Swap the module-level load() for a constant-events stub."""
    orig = module.load
    module.load = lambda spark, sf_dir, name: df
    return orig


def test_phrase_with_unknown_term_is_empty(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.index import phrase_retrieval

    out = phrase_retrieval(spark, sf_smoke, "fast zzzznotaword")
    assert out.count() == 0
    assert out.columns == ["doc_id", "n_matches"]


def test_asof_with_no_right_events(spark, sf_smoke):
    """No clicks at all: every view row survives with count 0 / NULL ts."""
    from bigdata_infra_cs489_spark.operators import temporal as TJ

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, 1, "view", t0 + dt.timedelta(minutes=i)) for i in range(3)],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    orig = _patch_events(TJ, df)
    try:
        rows = TJ.asof_last_event(spark, sf_smoke).collect()
    finally:
        TJ.load = orig
    assert len(rows) == 3
    assert all(r.prior_click_cnt == 0 and r.last_click_ts is None for r in rows)


def test_funnel_missing_stage_caps(spark, sf_smoke):
    """Users without the later stages stop at the stage they reached, and
    out-of-order events don't count (purchase before click)."""
    from bigdata_infra_cs489_spark.operators import events as E

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, uid, typ, minutes):
        return (i, t0 + dt.timedelta(minutes=minutes), uid, typ, 0.0, "{}")

    df = spark.createDataFrame(
        [
            ev(1, 1, "signup", 0),
            ev(2, 1, "click", 1),
            ev(3, 1, "purchase", 2),  # full funnel
            ev(4, 2, "signup", 0),  # stops at 1
            ev(5, 3, "signup", 0),
            ev(6, 3, "purchase", 1),  # purchase BEFORE any click: stage 1
            ev(7, 3, "click", 2),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = _patch_events(E, df)
    try:
        got = {
            r.user_id: r.stage for r in E.user_funnel(spark, sf_smoke).collect()
        }
    finally:
        E.load = orig
    assert got == {1: 3, 2: 1, 3: 2}  # user 3: signup + later click, no
    # purchase after that click


def test_snapshot_diff_disjoint_keys(spark):
    from bigdata_infra_cs489_spark.operators.table_ops import snapshot_diff

    old = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    new = spark.createDataFrame([(3, "c")], "k long, v string")
    got = {
        r.k: r.change_type
        for r in snapshot_diff(old, new, "k", ["v"]).collect()
    }
    assert got == {1: "removed", 2: "removed", 3: "added"}


def test_gap_fill_covers_span_without_holes(spark, sf_smoke):
    """The spine is dense: bucket count per type == (hi-lo)/step + 1 and
    every count matches the raw tumbling aggregation."""
    from bigdata_infra_cs489_spark.operators import events as E

    out = E.gap_filled_counts(spark, sf_smoke)
    per_type = (
        out.groupBy("event_type").count().select("count").distinct().collect()
    )
    assert len(per_type) == 1  # same dense bucket count for every type
    total_events = out.agg(F.sum("n_events")).collect()[0][0]
    from bigdata_infra_cs489_spark.sources.tables import load

    assert total_events == load(spark, sf_smoke, "events").count()


# --- distsort primitives (operators/distsort.py) ----------------------------
# The range-partitioned prefix machinery backs 4 oracle-checked queries;
# these pin its behavior where range partitioning degenerates.


def _prefix(spark, rows, **kw):
    from bigdata_infra_cs489_spark.operators.distsort import with_running_totals

    df = spark.createDataFrame(rows, "k long, v long")
    return with_running_totals(df, [F.asc("k")], {"cum": "v"}, **kw)


def test_distsort_empty_input(spark):
    assert _prefix(spark, []).collect() == []


def test_distsort_single_row(spark):
    rows = _prefix(spark, [(5, 7)], row_col="rn").collect()
    assert [(r.k, r.v, r.cum, r.rn) for r in rows] == [(5, 7, 7, 1)]


def test_distsort_fewer_rows_than_partitions(spark):
    # 3 rows, 32 shuffle partitions: most range slices are empty
    rows = _prefix(spark, [(3, 30), (1, 10), (2, 20)], row_col="rn").collect()
    got = sorted((r.k, r.cum, r.rn) for r in rows)
    assert got == [(1, 10, 1), (2, 30, 2), (3, 60, 3)]


def test_distsort_all_equal_keys_total_is_exact(spark):
    # a single-value key degenerates range partitioning to one slice;
    # the inclusive running sum must still end at the exact total
    rows = _prefix(spark, [(1, 1)] * 100).collect()
    assert len(rows) == 100
    assert max(r.cum for r in rows) == 100
    assert sorted(r.cum for r in rows) == list(range(1, 101))


def test_distsort_matches_single_partition_window(spark):
    # parity against the plan distsort exists to replace
    import random

    from pyspark.sql.window import Window

    rnd = random.Random(7)
    data = [(rnd.randrange(50), rnd.randrange(100)) for _ in range(500)]
    # total order requires a tiebreaker: make keys unique
    data = [(k * 1000 + i, v) for i, (k, v) in enumerate(data)]
    got = {
        r.k: (r.cum, r.rn)
        for r in _prefix(spark, data, row_col="rn").collect()
    }
    df = spark.createDataFrame(data, "k long, v long")
    w = Window.orderBy("k")
    want = {
        r.k: (r.cum, r.rn)
        for r in df.select(
            "k",
            F.sum("v")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("cum"),
            F.row_number().over(w).alias("rn"),
        ).collect()
    }
    assert got == want


def test_distsort_ntile_matches_builtin(spark):
    from pyspark.sql.window import Window

    from bigdata_infra_cs489_spark.operators.distsort import with_ntile

    for n_rows in (1, 3, 10, 103):
        data = [((i * 37) % n_rows, i) for i in range(n_rows)]
        df = spark.createDataFrame(data, "k long, i long")
        got = {
            r.i: r.q
            for r in with_ntile(df, [F.asc("k"), F.asc("i")], 4, "q").collect()
        }
        want = {
            r.i: r.q
            for r in df.select(
                "i",
                F.ntile(4).over(Window.orderBy("k", "i")).alias("q"),
            ).collect()
        }
        assert got == want, f"n_rows={n_rows}"


def test_cms_unseen_key_estimate_is_collision_bounded(spark):
    """Probing a key that never occurred returns either no cell hit (no
    row) or a pure-collision estimate — never negative, never huge."""
    from bigdata_infra_cs489_spark.operators.sketch import cms_build, cms_estimate

    toks = spark.createDataFrame(
        [("alpha",)] * 5 + [("beta",)] * 2, "token string"
    )
    sketch = cms_build(toks)
    probe = spark.createDataFrame([("alpha",), ("gamma",)], "token string")
    est = {r.token: r.cms_est for r in cms_estimate(sketch, probe).collect()}
    assert est["alpha"] >= 5  # one-sided error
    # gamma never occurred: any estimate is collision mass from 7 tokens
    assert est.get("gamma", 0) <= 7


def test_edit_distance_pairs_empty_candidates(spark):
    from bigdata_infra_cs489_spark.operators.dedup import edit_distance_pairs

    docs = spark.createDataFrame(
        [(1, "some text"), (2, "other text")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert edit_distance_pairs(docs, pairs).count() == 0


def _patch_docs(module, df):
    orig = module.load
    module.load = lambda spark, sf_dir, name, **kw: df
    return orig


def test_spans_on_duplication_free_corpus(spark, sf_smoke):
    """A corpus with zero repeated k-grams: no spans, zero coverage, and
    strip returns every document unchanged (including one shorter than
    SPAN_K, which can't even form a window)."""
    from bigdata_infra_cs489_spark.operators import spans as SP

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
            (3, "tiny doc"),  # < SPAN_K tokens
        ],
        "doc_id long, text string",
    )
    orig = _patch_docs(SP, docs)
    try:
        assert SP.repeated_spans(spark, sf_smoke).count() == 0
        stats = {r.doc_id: r for r in SP.dup_span_stats(spark, sf_smoke).collect()}
        assert set(stats) == {1, 2, 3}
        assert all(r.dup_tokens == 0 and r.dup_fraction == 0.0 for r in stats.values())
        stripped = {r.doc_id: r for r in SP.strip_spans(spark, sf_smoke).collect()}
        assert stripped[3].clean_text == "tiny doc"
        assert all(r.kept_tokens == r.n_tokens for r in stripped.values())
    finally:
        SP.load = orig


def test_incremental_spans_with_empty_old_corpus(spark, sf_smoke):
    """Every doc in the 'new' batch (doc_id % 10 == 9): the standing gram
    index is empty, so nothing can be a vs-old duplicate even when the
    new docs duplicate EACH OTHER."""
    from bigdata_infra_cs489_spark.operators import spans as SP

    same = "the exact same sentence repeated across both new documents"
    docs = spark.createDataFrame(
        [(9, same), (19, same)], "doc_id long, text string"
    )
    orig = _patch_docs(SP, docs)
    try:
        assert SP.incremental_spans(spark, sf_smoke).count() == 0
        stats = SP.incremental_span_stats(spark, sf_smoke).collect()
        assert {r.doc_id for r in stats} == {9, 19}
        assert all(r.dup_old_tokens == 0 for r in stats)
        # sanity: the corpus-wide operator DOES see the duplication
        assert SP.repeated_spans(spark, sf_smoke).count() == 2
    finally:
        SP.load = orig


def test_spans_hot_gram_boilerplate_corpus(spark, sf_smoke):
    """One boilerplate sentence across MANY docs — the skew case the
    gram-count join (not window) exists for. Every doc's boilerplate
    prefix must be a span; the unique tails must not."""
    from bigdata_infra_cs489_spark.operators import spans as SP

    boiler = "subscribe to our newsletter for updates and exclusive offers"
    n_b = len(boiler.split())
    # tails must stay distinct AFTER tokenization (digits are stripped,
    # so "tail0"/"tail1" would collapse to the same token) — letter runs
    docs = spark.createDataFrame(
        [
            (
                i,
                f"{boiler} {'x' * (i + 1)} {'y' * (i + 1)} "
                f"{'z' * (i + 1)} {'q' * (i + 1)} {'w' * (i + 1)}",
            )
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    orig = _patch_docs(SP, docs)
    try:
        got = {r.doc_id: (r.span_start, r.span_end) for r in SP.repeated_spans(spark, sf_smoke).collect()}
        assert set(got) == set(range(40))
        for d, (s, e) in got.items():
            assert s == 1 and e == n_b  # exactly the boilerplate prefix
    finally:
        SP.load = orig
