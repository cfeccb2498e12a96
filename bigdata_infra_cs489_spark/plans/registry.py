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
# Round-8 rotation (new registrations + staleness refresh):
#   slots 1-16   the full round-7-staged queue (plans/staged.py as of
#                round 7), registered this round and never
#                driver-checked: line dedup (+ its streaming twin, which
#                shares incremental_line_dedup's oracle — the complete
#                output is row-identical by the twin contract), fuzzy
#                decontamination, the quality-distillation classifier,
#                corpus_curate_v2, HTML extraction, JL random
#                projection, pack_manifest, k-anonymity, DSIR
#                resampling. Each was value-verified in pytest (inline
#                oracle + independent Python/NumPy reimplementation)
#                while staged, plus a 10-query sf0.1 oracle run; the
#                driver row is the remaining external evidence.
#   slots 17-50  34 of the 48-query cohort whose latest driver row is
#                round 4 (alphabetical; all equally old). The remaining
#                14 (spam_model_auc .. weekly_active_users) queue for
#                round 9 at lag 4, inside the size-derived staleness
#                bound max(4, ceil(211/50)) = 5 rounds mechanized by
#                tests/test_registry_contract.py.
# The round-8 advisory fixes (quality_model pred thresholds on the
# 6dp-rounded score on both engines; pack_manifest integer DIV) change
# only slots entering the window this round; everything else keeps its
# r5-r7 rows plus verify_sweep + pytest coverage.
#
# STAGED FOR THE ROUND-9 ROTATION (built + value-verified in round 8;
# queue single-sourced in plans/staged.py, oracle SQL in each family's
# test file): ccnet_perplexity_buckets, ccnet_bucket_stats,
# source_mixture_plan, link_indegree_hist, pq_distortion_stats,
# contamination_spans, cdc_chunk_stats, split_balance_report,
# curation_funnel, media_content_dedup, crawl_frontier,
# near_dup_method_audit, token_drift_report, events_anomaly_days
# (14 plan-auditable), plus bpe_encode_stats (ITERATIVE trainer loop,
# excluded from the plan-auditable listing like bpe_merges) — 15
# queries. Round-9 window = these 15 + the 14 r4-stale overflow
# (spam_model_auc .. weekly_active_users) + the 21 alphabetically-first
# r5-stale queries; the remaining 26 r5 queries reach lag 5 at round
# 10, inside the size-derived bound for a 226-query registry.
_DRIVER_WINDOW_FIRST = (
    # -- slots 1-16: registered this round, never driver-checked ------
    "dsir_resample",
    "dup_line_stats",
    "line_dedup_corpus",
    "incremental_line_dedup",
    "stream_line_dedup",
    "contamination_near",
    "quality_model_weights",
    "quality_model_scores",
    "quality_model_report",
    "corpus_curate_v2",
    "html_extract",
    "html_link_edges",
    "rp_projected",
    "rp_recall_topk",
    "pack_manifest",
    "k_anonymity_report",
    # -- slots 17-50: latest driver row round 4 ------------------------
    "bloom_prefilter_check",
    "bpe_merges",
    "bpe_token_counts",
    "cms_heavy_hitters",
    "corpus_report",
    "customer_rfm",
    "dedup_keep_best",
    "editdist_near_duplicates",
    "embedding_drift",
    "events_json_stats",
    "events_quality_gate",
    "events_sessionize",
    "incremental_dedup_assign",
    "ivf_topk_trained",
    "ivf_train_centroids",
    "ivfpq_topk",
    "ivfpq_topk_indexed",
    "jaccard_prefix_join",
    "jsonl_roundtrip_events",
    "lang_mixture_rates",
    "leakage_safe_split",
    "lsh_topk_indexed",
    "minhash_estimate_error",
    "orc_roundtrip_customer",
    "partitioned_day_scan",
    "pq_codes",
    "pq_topk",
    "schema_evolution_events",
    "sequence_pack",
    "source_dedup_rates",
    "source_lang_entropy",
    "spam_apply",
    "spam_ensemble_average",
    "spam_ensemble_vote",
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
