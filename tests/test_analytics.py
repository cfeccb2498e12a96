"""Warehouse analytics / sketch / chunking extensions: oracle parity and
semantic invariants."""

from __future__ import annotations

from .oracle import assert_matches_oracle

NEW_QUERIES = (
    "user_retention_cohorts",
    "customer_rfm",
    "events_value_histogram",
    "doc_chunks",
    "token_zipf_stats",
    "editdist_near_duplicates",
    "cms_heavy_hitters",
)


def test_new_queries_match_oracle(spark, sf_smoke):
    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in NEW_QUERIES:
        assert_matches_oracle(qs[name](spark, sf_smoke), oracles[name], sf_smoke)


def test_cms_is_one_sided(spark, sf_correct):
    """CMS estimates never undercount — the sketch's defining guarantee."""
    from bigdata_infra_cs489_spark.operators.sketch import cms_heavy_hitters

    rows = cms_heavy_hitters(spark, sf_correct).collect()
    assert rows, "heavy hitter set should be non-empty on the fixture corpus"
    assert all(r.overcount >= 0 for r in rows)


def test_rfm_scores_cover_all_tiles(spark, sf_correct):
    from bigdata_infra_cs489_spark.operators.analytics import RFM_TILES, customer_rfm

    rows = customer_rfm(spark, sf_correct).collect()
    for col in ("r_score", "f_score", "m_score"):
        seen = {r[col] for r in rows}
        assert seen == set(range(1, RFM_TILES + 1))
    # quintiles are equal-height (first N%5 buckets one row larger)
    from collections import Counter

    c = Counter(r.r_score for r in rows)
    assert max(c.values()) - min(c.values()) <= 1


def test_doc_chunks_cover_and_overlap(spark, sf_smoke):
    """Chunks tile every document: first chunk starts at 0, consecutive
    chunks advance by the stride, and the union covers all tokens."""
    from bigdata_infra_cs489_spark.operators.textstats import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        doc_chunks,
        token_counts,
    )

    per_doc: dict[int, list] = {}
    for r in doc_chunks(spark, sf_smoke).collect():
        per_doc.setdefault(r.doc_id, []).append(r)
    n_words = {
        r.doc_id: r.n_words for r in token_counts(spark, sf_smoke).collect()
    }
    for doc_id, chunks in per_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        n = n_words[doc_id]
        # every token position is inside some chunk window
        covered = max(
            c.chunk_id * CHUNK_STRIDE + c.n_chunk_tokens for c in chunks
        )
        assert covered == n
        for c in chunks:
            assert c.n_chunk_tokens == min(CHUNK_SIZE, n - c.chunk_id * CHUNK_STRIDE)


def test_retention_day_zero_counts_every_user(spark, sf_correct):
    """Offset-0 cells sum to the number of distinct users (everyone is
    active on their own cohort day)."""
    from bigdata_infra_cs489_spark.operators.analytics import user_retention_cohorts
    from bigdata_infra_cs489_spark.sources.tables import load

    rows = user_retention_cohorts(spark, sf_correct).collect()
    day0 = sum(r.n_users for r in rows if r.day_offset == 0)
    n_users = load(spark, sf_correct, "events").select("user_id").distinct().count()
    assert day0 == n_users
    assert all(r.day_offset >= 0 for r in rows)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_doc_chunks_plan_is_narrow(spark, sf_smoke):
    """Chunking is pure per-row expansion — no key-based exchange (the
    only Exchange allowed is load()'s opt-in round-robin rebalance)."""
    from bigdata_infra_cs489_spark.operators.textstats import doc_chunks

    plan = _plan(doc_chunks(spark, sf_smoke)).lower()
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan


def test_cms_probe_broadcasts_sketch(spark, sf_smoke):
    """The D*W sketch grid joins the probe side as a broadcast, never a
    shuffle join."""
    from bigdata_infra_cs489_spark.operators.sketch import cms_heavy_hitters

    plan = _plan(cms_heavy_hitters(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan


def test_bloom_and_cms_match_oracle(spark, sf_smoke):
    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in ("bloom_prefilter_check", "cms_heavy_hitters"):
        assert_matches_oracle(qs[name](spark, sf_smoke), oracles[name], sf_smoke)


def test_bloom_has_no_false_negatives(spark, sf_correct):
    from bigdata_infra_cs489_spark.operators.sketch import bloom_prefilter_check

    row = bloom_prefilter_check(spark, sf_correct).collect()[0]
    assert row.n_false_pos >= 0  # pass set is a superset of the true set
    assert row.n_pass_bloom >= row.n_true
    assert 0 < row.n_bits_set


FEATURE_STORE_QUERIES = (
    "user_scd2_history",
    "user_decayed_value",
    "conversion_attribution",
    "dedup_keep_best",
    "heavy_key_report",
)


def test_feature_store_queries_match_oracle(spark, sf_smoke):
    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in FEATURE_STORE_QUERIES:
        assert_matches_oracle(qs[name](spark, sf_smoke), oracles[name], sf_smoke)


def test_scd2_intervals_partition_time(spark, sf_smoke):
    """SCD2 invariants: per user exactly one open interval, intervals
    chain (each valid_to equals the next valid_from), and attr changes
    across every boundary."""
    from collections import defaultdict

    from bigdata_infra_cs489_spark.operators.analytics import (
        SCD2_OPEN_END,
        user_scd2_history,
    )

    rows = user_scd2_history(spark, sf_smoke).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    assert by_user
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r.valid_from)
        assert [r.is_current for r in ivs].count(1) == 1
        assert ivs[-1].is_current == 1 and ivs[-1].valid_to == SCD2_OPEN_END
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from, (user, a, b)
            assert a.attr != b.attr, "consecutive intervals must differ"


def test_decayed_value_bounded_by_raw(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.analytics import user_decayed_value

    rows = user_decayed_value(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 0 < r.decayed_value <= r.raw_value + 1e-6


def test_attribution_credits_sum_to_value(spark, sf_smoke):
    """Linear attribution conserves value: per purchase, n_touches * credit
    reproduces the purchase value up to the 4dp rounding."""
    from collections import defaultdict

    from bigdata_infra_cs489_spark.operators.analytics import (
        conversion_attribution,
    )

    rows = conversion_attribution(spark, sf_smoke).collect()
    assert rows
    per_purchase = defaultdict(list)
    for r in rows:
        per_purchase[r.purchase_id].append(r)
    for pid, touches in per_purchase.items():
        n = touches[0].n_touches
        assert len(touches) == n
        total = sum(t.credit for t in touches)
        assert abs(total - n * touches[0].credit) < 1e-9
        assert all(t.n_touches == n for t in touches)


def test_keep_best_covers_all_docs(spark, sf_smoke):
    """Every document lands in exactly one cluster; the kept doc is a
    member of its own cluster and cluster sizes sum to the corpus size."""
    from bigdata_infra_cs489_spark.operators.dedup import dedup_keep_best
    from bigdata_infra_cs489_spark.sources.tables import load

    rows = dedup_keep_best(spark, sf_smoke).collect()
    n_docs = load(spark, sf_smoke, "documents").count()
    assert sum(r.cluster_size for r in rows) == n_docs
    assert len({r.cluster_id for r in rows}) == len(rows)
    for r in rows:
        assert r.cluster_size >= 1 and r.n_chars >= 0


CALIBRATION_QUERIES = (
    "source_quality_percentiles",
    "user_churn_flags",
    "leakage_safe_split",
    "cross_source_overlap",
    "event_type_transitions",
)


def test_calibration_queries_match_oracle(spark, sf_smoke):
    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in CALIBRATION_QUERIES:
        assert_matches_oracle(qs[name](spark, sf_smoke), oracles[name], sf_smoke)


def test_source_percentiles_span_unit_interval(spark, sf_smoke):
    """Within every source: pct_rank starts at 0, ends at 1 (for n>1),
    and is monotone in (n_chars, doc_id)."""
    from collections import defaultdict

    from bigdata_infra_cs489_spark.operators.analytics import (
        source_quality_percentiles,
    )

    rows = source_quality_percentiles(spark, sf_smoke).collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r.source].append(r)
    for src, docs in by_src.items():
        docs.sort(key=lambda r: (r.n_chars, r.doc_id))
        assert docs[0].pct_rank == 0.0
        if len(docs) > 1:
            assert docs[-1].pct_rank == 1.0
        assert all(
            a.pct_rank <= b.pct_rank for a, b in zip(docs, docs[1:])
        ), src


def test_leakage_safe_split_is_cluster_consistent(spark, sf_smoke):
    """Near-dup cluster members always share a split — the property that
    makes the split leakage-safe — and every document is assigned."""
    from collections import defaultdict

    from bigdata_infra_cs489_spark.operators.sampling import leakage_safe_split
    from bigdata_infra_cs489_spark.sources.tables import load

    rows = leakage_safe_split(spark, sf_smoke).collect()
    assert len(rows) == load(spark, sf_smoke, "documents").count()
    splits_per_cluster = defaultdict(set)
    for r in rows:
        splits_per_cluster[r.cluster_id].add(r.split)
    assert all(len(s) == 1 for s in splits_per_cluster.values())
    assert {r.split for r in rows} <= {"train", "val", "test"}


def test_churn_flag_matches_threshold(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.analytics import (
        CHURN_DAYS,
        user_churn_flags,
    )

    rows = user_churn_flags(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r.churned == int(r.days_inactive > CHURN_DAYS)


def test_transition_probs_sum_to_one(spark, sf_smoke):
    from collections import defaultdict

    from bigdata_infra_cs489_spark.operators.analytics import (
        event_type_transitions,
    )

    rows = event_type_transitions(spark, sf_smoke).collect()
    assert rows
    by_from = defaultdict(float)
    for r in rows:
        by_from[r.from_type] += r.prob
    for ft, total in by_from.items():
        assert abs(total - 1.0) < 1e-3, ft


def test_feature_matrix_matches_oracle_and_consistency(spark, sf_smoke):
    import __spark_entry__ as entrymod

    from .oracle import assert_matches_oracle

    name = "user_feature_matrix"
    assert_matches_oracle(
        entrymod.queries()[name](spark, sf_smoke),
        entrymod.oracle_sql()[name],
        sf_smoke,
    )

    from bigdata_infra_cs489_spark.operators.analytics import user_feature_matrix

    rows = user_feature_matrix(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r.n_click + r.n_view + r.n_error + r.n_purchases <= r.n_events
        assert r.decayed_value <= r.raw_value + 1e-6
        assert r.churned in (0, 1)


DIAGNOSTIC_QUERIES = (
    "ab_test_zscore",
    "source_lang_entropy",
    "events_quality_gate",
    "embedding_drift",
)


def test_diagnostic_queries_match_oracle(spark, sf_smoke):
    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in DIAGNOSTIC_QUERIES:
        assert_matches_oracle(qs[name](spark, sf_smoke), oracles[name], sf_smoke)


def test_entropy_bounds(spark, sf_smoke):
    import math

    from bigdata_infra_cs489_spark.operators.analytics import source_lang_entropy

    rows = source_lang_entropy(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 0 <= r.entropy <= math.log(r.n_langs) + 1e-9


def test_quality_gate_clean_fixture(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.analytics import events_quality_gate

    [r] = events_quality_gate(spark, sf_smoke).collect()
    assert r.n_rows > 0
    assert r.n_null_user == 0 and r.n_unknown_type == 0
    assert r.n_ts_out_of_range == 0
    assert 0 <= r.n_value_over_cap <= r.n_rows


def test_ab_arms_cover_both(spark, sf_smoke):
    from bigdata_infra_cs489_spark.operators.analytics import ab_test_zscore

    [r] = ab_test_zscore(spark, sf_smoke).collect()
    assert r.n_a > 0 and r.n_b > 0
    assert abs(r.zscore) < 50


def test_seasonality_and_dedup_rates_match_oracle(spark, sf_smoke):
    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in ("events_seasonality", "source_dedup_rates"):
        assert_matches_oracle(qs[name](spark, sf_smoke), oracles[name], sf_smoke)

    from bigdata_infra_cs489_spark.operators.analytics import events_seasonality

    rows = events_seasonality(spark, sf_smoke).collect()
    assert all(1 <= r.dow <= 7 and 0 <= r.hour <= 23 for r in rows)


def test_value_deciles_match_oracle_and_concentrate(spark, sf_smoke):
    import __spark_entry__ as entrymod

    from .oracle import assert_matches_oracle

    name = "user_value_deciles"
    assert_matches_oracle(
        entrymod.queries()[name](spark, sf_smoke),
        entrymod.oracle_sql()[name],
        sf_smoke,
    )

    from bigdata_infra_cs489_spark.operators.analytics import user_value_deciles

    rows = sorted(
        user_value_deciles(spark, sf_smoke).collect(), key=lambda r: r.decile
    )
    assert [r.decile for r in rows] == list(range(1, len(rows) + 1))
    assert all(
        a.total_value >= b.total_value for a, b in zip(rows, rows[1:])
    ), "deciles are ordered by spend"
    assert sum(r.value_share_ppm for r in rows) <= 1_000_000
