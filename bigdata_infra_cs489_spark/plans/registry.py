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
# Round-7 rotation (new registrations + staleness refresh):
#   slots 1-6    the round-6-staged families, registered this round and
#                never driver-checked: PII detection/redaction, the
#                Gopher quality gate, DSIR importance scoring. Each was
#                value-verified in pytest (inline oracle + pure-Python
#                reimplementation) while staged; the driver row is the
#                remaining external evidence.
#   slots 7-50   the full 44-query cohort whose latest driver row is
#                round 3 (alphabetical; all equally old) — rotated in so
#                no query's latest driver row lags more than three
#                rounds behind CORRECTNESS_r07, per the mechanized
#                staleness rule in tests/test_registry_contract.py.
# The round-7 advisory fixes (staged PII redaction counts, widened PII
# patterns, gopher_pass_rates empty-corpus guard, lang_temperature float
# division) change no query outside slots 1-6 on the fixture corpora
# (lang_temperature_* values are bit-identical below 2^53; re-verified
# by targeted verify_sweep), so the r4-r6 rows of everything else remain
# valid evidence. Everything outside the window keeps its verify_sweep +
# pytest coverage.
#
# STAGED FOR THE ROUND-8 ROTATION (built + value-verified in round 7;
# register() deliberately deferred so the window contract stays exact —
# oracle SQL sits in each family's test file or composes from catalog
# fragments): dsir_resample, dup_line_stats, line_dedup_corpus,
# incremental_line_dedup, contamination_near, quality_model_weights,
# quality_model_scores, quality_model_report, corpus_curate_v2,
# html_extract, html_link_edges, rp_projected, rp_recall_topk,
# pack_manifest, stream_line_dedup (the streaming twin registers with
# incremental_line_dedup's oracle — identical output). Round-8 window =
# these 15 + 35 of the 48-query r4-stale cohort; the ~13 overflow
# queues for r9 under the size-derived staleness bound
# (tests/test_registry_contract.py).
_DRIVER_WINDOW_FIRST = (
    # -- slots 1-6: registered this round, never driver-checked -------
    "pii_stats",
    "pii_redact",
    "gopher_quality_flags",
    "gopher_pass_rates",
    "dsir_scores",
    "dsir_topk",
    # -- slots 7-50: latest driver row round 3 ------------------------
    "bigram_lm_perplexity",
    "boilerplate_fraction",
    "boilerplate_ngrams",
    "clean_corpus",
    "contamination_flags",
    "customers_without_orders",
    "dataset_split",
    "degree_distribution",
    "doc_fingerprints",
    "error_click_window_counts",
    "events_apply_changes",
    "events_asof_last_click",
    "events_cube_counts",
    "events_distinct_users",
    "events_gap_filled_counts",
    "events_hash_sample",
    "events_rollup_counts",
    "events_sketch_check",
    "events_sliding_counts",
    "events_snapshot_diff",
    "events_tumbling_counts",
    "events_value_percentiles",
    "ivf_topk_indexed",
    "lang_mixture_sample",
    "media_meta",
    "order_quartiles",
    "profile_lineitem",
    "quality_stratified_sample",
    "repetition_stats",
    "stream_dedup",
    "stream_enriched",
    "stream_error_click_join",
    "stream_running_counts",
    "stream_session_windows",
    "stream_sliding_counts",
    "stream_tumbling_counts",
    "tbl_scan_nation",
    "token_counts",
    "top_users_by_type",
    "triangle_count",
    "user_event_gaps",
    "user_funnel",
    "user_rolling_value",
    "user_type_pivot",
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
