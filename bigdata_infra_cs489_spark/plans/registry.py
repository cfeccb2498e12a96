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
# Round-4 rotation, front-loading the entire known verification debt:
#   slots 1-5   the five round-3 driver-RED queries, now fixed (their
#               oracles emitted HUGEINT columns — pandas-fragile; all
#               are CAST AS BIGINT now) — kept in the window so
#               CORRECTNESS_r04 proves the fix;
#   slots 6-13  the eight queries whose last driver row is a stale r2
#               `no_oracle` (oracles added late in r3: recursive-CTE SGD
#               replay for the spam family, unrolled k-means for IVF);
#   slots 14-50 37 of the 72 never-driver-checked queries, prioritized:
#               the six that carried the same latent HUGEINT bug (fixed
#               this round), the VERDICT-named ops (term_lookup,
#               jaccard_prefix_join, user_scd2_history), then family
#               representatives (PQ/IVFPQ, BPE, sketches, dedup suite,
#               feature store, streaming sinks, format roundtrips).
# The 35 still-unchecked names queue directly after slot 50 so the
# round-5 rotation clears the backlog completely. Names and semantics
# are untouched — this is purely an export-order contract; everything
# outside the window keeps its verify_sweep + pytest coverage.
_DRIVER_WINDOW_FIRST = (
    # -- round-3 driver-red, fixed this round -------------------------
    "sequence_pack",
    "token_budget_pack",
    "events_sessionize",
    "events_json_stats",
    "lang_mixture_rates",
    # -- stale r2 no_oracle rows, oracles now exist -------------------
    "spam_train",
    "spam_train_shuffled",
    "spam_apply",
    "spam_ensemble_average",
    "spam_ensemble_vote",
    "spam_model_auc",
    "ivf_train_centroids",
    "ivf_topk_trained",
    # -- never driver-checked: latent-HUGEINT fixes first -------------
    "token_zipf_stats",
    "corpus_report",
    "schema_evolution_events",
    "user_feature_matrix",
    "source_lang_entropy",
    "events_quality_gate",
    # -- never driver-checked: VERDICT-named --------------------------
    "term_lookup",
    "jaccard_prefix_join",
    "user_scd2_history",
    # -- never driver-checked: vector/PQ family -----------------------
    "lsh_topk_indexed",
    "pq_codes",
    "pq_topk",
    "ivfpq_topk",
    "ivfpq_topk_indexed",
    "knn_label_accuracy",
    "hard_negative_pairs",
    "embedding_drift",
    # -- never driver-checked: BPE + sketches -------------------------
    "bpe_merges",
    "bpe_token_counts",
    "cms_heavy_hitters",
    "bloom_prefilter_check",
    # -- never driver-checked: dedup suite ----------------------------
    "dedup_keep_best",
    "incremental_dedup_assign",
    "leakage_safe_split",
    "editdist_near_duplicates",
    "minhash_estimate_error",
    "source_dedup_rates",
    # -- never driver-checked: feature store / retention --------------
    "customer_rfm",
    "user_retention_cohorts",
    "weekly_active_users",
    "user_churn_flags",
    "user_decayed_value",
    # -- never driver-checked: streaming sinks + format roundtrips ----
    "stream_upsert_user_state",
    "stream_partitioned_sink",
    "orc_roundtrip_customer",
    "jsonl_roundtrip_events",
    "partitioned_day_scan",
    # ---- slot 51+: the 35 remaining never-checked, queued for r5 ----
    "bucketed_customer_orders",
    "source_capped_sample",
    "media_features",
    "video_frames",
    "pagerank_topk",
    "doc_keywords",
    "user_value_anomalies",
    "events_value_histogram",
    "doc_chunks",
    "heavy_key_report",
    "conversion_attribution",
    "source_quality_percentiles",
    "events_value_median_by_type",
    "cross_source_overlap",
    "event_type_transitions",
    "weighted_sample_topn",
    "label_propagation_communities",
    "session_cooccurrence",
    "funnel_latency",
    "daily_value_ewma",
    "events_exact_median_global",
    "spam_calibration_bins",
    "nation_market_share",
    "top_terms_per_lang",
    "promo_revenue_share",
    "ab_test_zscore",
    "top_suppliers_by_revenue",
    "top_return_customers",
    "user_erasure_audit",
    "events_throttled",
    "user_rolling_anomalies",
    "incremental_agg_refresh",
    "events_debounced",
    "events_seasonality",
    "user_value_deciles",
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
