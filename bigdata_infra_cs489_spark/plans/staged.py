"""The next-round registration queue, single-sourced.

Operators built and value-verified mid-round whose ``register()`` is
deferred to the next window rotation (the driver checks exactly the
first 50 ``queries()`` entries per round — see ``registry.py``'s
rotation notes and ``tests/test_registry_contract.py`` for the
mechanized contract).

Consumers:
- ``tests/test_plan_hygiene.py`` holds every entry here to the same
  plan bar as the registry (no row-at-a-time Python, no partition-less
  window, vectorized scans) so the queue can't regress while it waits;
- ``tools/plan_audit.py`` appends a staged section to PLAN_AUDIT.md;
- each rotation lifts every entry into ``catalog.py`` with its oracle
  SQL (written alongside the operator in its family's test file or
  composed from catalog fragments).

The round-7 queue (line dedup + streaming twin, fuzzy decontamination,
quality-distillation classifier, corpus_curate_v2, HTML extraction, JL
random projection, pack_manifest, k-anonymity, DSIR resampling — 16
queries) registered in the round-8 rotation. The entries below were
built and value-verified in round 8 (oracle SQL in each family's test
file, composing from catalog fragments) and queue for the round-9
rotation, together with ``bpe_encode_stats`` (tokenizer apply +
fertility card) which is EXCLUDED from this plan-auditable listing for
the registry's own ITERATIVE rationale — its callable runs the BPE
trainer loop, so building its plan string would re-run the whole loop;
its value evidence is tests/test_bpe_encode.py (DuckDB oracle +
pure-Python merge replay).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def staged_queries() -> dict[str, QueryFn]:
    """name -> callable for every plan-auditable staged operator."""
    from ..operators.analytics import events_anomaly_days
    from ..operators.ccnet import ccnet_bucket_stats, ccnet_perplexity_buckets
    from ..operators.curate import curation_funnel
    from ..operators.dedup import cdc_chunk_stats, near_dup_method_audit
    from ..operators.dsir import token_drift_report
    from ..operators.extraction import crawl_frontier, link_indegree_hist
    from ..operators.multimodal import media_content_dedup
    from ..operators.sampling import source_mixture_plan, split_balance_report
    from ..operators.similarity import pq_distortion_stats
    from ..operators.spans import contamination_spans

    return {
        "ccnet_perplexity_buckets": ccnet_perplexity_buckets,
        "ccnet_bucket_stats": ccnet_bucket_stats,
        "source_mixture_plan": source_mixture_plan,
        "link_indegree_hist": link_indegree_hist,
        "pq_distortion_stats": pq_distortion_stats,
        "contamination_spans": contamination_spans,
        "cdc_chunk_stats": cdc_chunk_stats,
        "split_balance_report": split_balance_report,
        "curation_funnel": curation_funnel,
        "media_content_dedup": media_content_dedup,
        "crawl_frontier": crawl_frontier,
        "near_dup_method_audit": near_dup_method_audit,
        "token_drift_report": token_drift_report,
        "events_anomaly_days": events_anomaly_days,
    }
