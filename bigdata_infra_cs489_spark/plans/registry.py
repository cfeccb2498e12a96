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
# Rounds 1-2 both checked the same first-50, so the 50 queries registered
# later (the whole streaming/temporal/CDC/sampling/textstats surface) never
# produced a driver row. This list rotates the never-driver-checked,
# oracle-backed queries into the window; everything else follows in
# registration order. The union of CORRECTNESS_r{1,2,3} then covers the
# entire PRE-round-3 backlog; entries past slot 50 (round-3 additions and
# the registration-order tail) queue for the round-4 rotation — until
# then their value checks come from tools/verify_sweep (SWEEP_LOCAL.json,
# independently re-runnable) and pytest, not a driver row. Names and
# semantics are untouched — this is purely an export-order contract.
_DRIVER_WINDOW_FIRST = (
    "sequence_pack",
    "token_budget_pack",
    "token_counts",
    "doc_fingerprints",
    "repetition_stats",
    "events_tumbling_counts",
    "events_sliding_counts",
    "events_sessionize",
    "events_json_stats",
    "events_gap_filled_counts",
    "degree_distribution",
    "triangle_count",
    "user_funnel",
    "top_users_by_type",
    "media_meta",
    "tbl_scan_nation",
    "customers_without_orders",
    "events_rollup_counts",
    "events_cube_counts",
    "events_value_percentiles",
    "events_distinct_users",
    "user_event_gaps",
    "user_type_pivot",
    "order_quartiles",
    "user_rolling_value",
    "events_sketch_check",
    "events_hash_sample",
    "dataset_split",
    "quality_stratified_sample",
    "lang_mixture_rates",
    "lang_mixture_sample",
    "events_asof_last_click",
    "error_click_window_counts",
    "profile_lineitem",
    "events_snapshot_diff",
    "events_apply_changes",
    "clean_corpus",
    "contamination_flags",
    "boilerplate_ngrams",
    "boilerplate_fraction",
    "bigram_lm_perplexity",
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_running_counts",
    "stream_dedup",
    "stream_enriched",
    "stream_error_click_join",
    # round-3 additions / newly-oracled entries (the window holds 50;
    # names past slot 50 are simply next in line for a future rotation)
    "ppr_topk",
    "ivf_topk_indexed",
    "lsh_topk_indexed",
    "bucketed_customer_orders",
    "source_capped_sample",
    "media_features",
    "video_frames",
    "pq_codes",
    "pq_topk",
    "ivfpq_topk",
    "ivfpq_topk_indexed",
    "stream_partitioned_sink",
    "pagerank_topk",
    "doc_keywords",
    "ivf_train_centroids",
    "ivf_topk_trained",
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
