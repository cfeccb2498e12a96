"""Driver contract assembly: queries() and oracle_sql().

Every operator family module contributes (name -> callable) and
(name -> DuckDB oracle SQL). A missing oracle entry means the op is not
SQL-expressible (iterative PPR, sequential SGD, streaming) and the driver
records a weaker rows-only check — keep that set minimal.

Conventions that keep the cross-engine value hash stable:
- identical output column names on both sides (driver sorts columns by name);
- doubles rounded (money 2dp, ratios 4dp) on both sides;
- timestamps rendered as 'yyyy-MM-dd' / 'yyyy-MM' strings on both sides;
- top-k queries carry deterministic tie-break orderings on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    if name in _QUERIES:
        raise ValueError(f"duplicate query name {name!r}")
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


# The driver's correctness run covers the FIRST 50 entries of queries().
# Round-9 rotation (new registrations + staleness refresh):
#   slots 1-15   the full round-8-staged queue (plans/staged.py as of
#                round 8), registered this round and never
#                driver-checked: CCNet perplexity terciles ×2, the
#                temperature mixture plan, split-balance QA, the
#                crawl-link histogram + frontier, PQ distortion,
#                contamination spans, CDC chunk dedup, the curation
#                funnel, container-invariant media dedup, the
#                cross-method near-dup audit, token drift,
#                daily-anomaly scan, and bpe_encode_stats. Each was
#                value-verified in pytest (inline oracle + independent
#                Python/NumPy reimplementation) while staged, plus a
#                13-query sf0.1 oracle run (staged_oracle_sf01_r8.log);
#                the driver row is the remaining external evidence.
#   slots 16-29  the 14-query r4-stale overflow deferred from round 8
#                (spam_model_auc .. weekly_active_users), now at lag 5 —
#                exactly the size-derived staleness bound
#                max(4, ceil(226/50)) = 5 rounds mechanized by
#                tests/test_registry_contract.py.
#   slots 30-50  the 21 alphabetically-first queries of the 47-query
#                round-5 cohort (ab_test_zscore ..
#                incremental_agg_refresh; all equally old).
# The round-8 advisory fix (split_balance_report deviation_ppm int64
# rescale) changes only a slot entering the window this round.
#
# ROUND-10 WINDOW, PRE-COMMITTED (the r10 staleness head-off): the
# remaining 26 r5-stale queries (incremental_curate ..
# weighted_sample_topn) MUST hold slots — they reach lag 5 at round 10.
# That leaves 24 slots for round-9-staged registrations first, then the
# alphabetical head of the round-6 cohort (50 queries, lag 4 at r10).
# The r6 cohort's overflow reaches lag 5 at round 11 and fits the
# following window iff new registrations stay ≤ 24 slots per round at
# the current registry size — keep the r9 staging queue within that.
# The round-9 queue closed at 12 (plans/staged.py: embedding_dedup_recall,
# crawl_pagerank, langid_confusion, dedup_cluster_hist,
# dedup_index_commit, bpe_vocab_coverage, export_shards,
# source_perplexity_report, stream_token_drift,
# quality_signal_agreement, jaccard_threshold_curve,
# lsh_banding_recall), so the r10 window = 26 r5-stale + 12 newly
# registered + the 12 alphabetically-first r6-cohort queries; at the
# resulting 238-query registry the bound is max(4, ceil(238/50)) = 5,
# and the r6 cohort only reaches lag 5 at round 11 — one full window
# of slack.
_DRIVER_WINDOW_FIRST = (
    # -- slots 1-15: registered this round, never driver-checked ------
    "ccnet_perplexity_buckets",
    "ccnet_bucket_stats",
    "source_mixture_plan",
    "split_balance_report",
    "link_indegree_hist",
    "crawl_frontier",
    "pq_distortion_stats",
    "contamination_spans",
    "cdc_chunk_stats",
    "curation_funnel",
    "media_content_dedup",
    "near_dup_method_audit",
    "token_drift_report",
    "events_anomaly_days",
    "bpe_encode_stats",
    # -- slots 16-29: latest driver row round 4 (lag-5 deadline) -------
    "spam_model_auc",
    "spam_train",
    "spam_train_shuffled",
    "stream_partitioned_sink",
    "stream_upsert_user_state",
    "term_lookup",
    "token_budget_pack",
    "token_zipf_stats",
    "user_churn_flags",
    "user_decayed_value",
    "user_feature_matrix",
    "user_retention_cohorts",
    "user_scd2_history",
    "weekly_active_users",
    # -- slots 30-50: latest driver row round 5 (alphabetical head) ----
    "ab_test_zscore",
    "bucketed_customer_orders",
    "cluster_balanced_sample",
    "conversion_attribution",
    "corpus_curate",
    "corpus_novelty",
    "cross_source_overlap",
    "daily_value_ewma",
    "doc_chunks",
    "doc_keywords",
    "dup_span_stats",
    "event_type_transitions",
    "events_debounced",
    "events_exact_median_global",
    "events_seasonality",
    "events_throttled",
    "events_value_histogram",
    "events_value_median_by_type",
    "funnel_latency",
    "heavy_key_report",
    "incremental_agg_refresh",
)


def _window_order(names: list[str]) -> list[str]:
    windowed = set(_DRIVER_WINDOW_FIRST)
    front = [n for n in _DRIVER_WINDOW_FIRST if n in names]
    rest = [n for n in names if n not in windowed]
    return front + rest


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {n: _QUERIES[n] for n in _window_order(list(_QUERIES))}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {n: _ORACLES[n] for n in _window_order(list(_ORACLES))}


_LOADED = False


def _load_all() -> None:
    """Import every operator module for its registration side effects."""
    global _LOADED
    if _LOADED:
        return
    from . import catalog  # noqa: F401

    _LOADED = True
