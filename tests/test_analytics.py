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
