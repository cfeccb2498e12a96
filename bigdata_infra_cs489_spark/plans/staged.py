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

The round-8 queue (CCNet terciles ×2, source mixture plan, crawl-link
histogram + frontier, PQ distortion, contamination spans, CDC chunks,
split balance, curation funnel, media content dedup, near-dup method
audit, token drift, anomaly days, bpe_encode_stats — 15 queries)
registered in the round-9 rotation. Entries added below during round 9
queue for the round-10 rotation; keep the queue ≤ 24 slots (the
pre-committed r10 window in ``registry.py`` reserves 26 slots for the
r5-stale cohort).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def staged_queries() -> dict[str, QueryFn]:
    """name -> callable for every plan-auditable staged operator."""
    from ..operators.bpe import bpe_vocab_coverage
    from ..operators.ccnet import source_perplexity_report
    from ..operators.curate import export_shards
    from ..operators.dedup import (
        dedup_cluster_hist,
        dedup_index_commit,
        jaccard_threshold_curve,
        lsh_banding_recall,
    )
    from ..operators.docquality import quality_signal_agreement
    from ..operators.extraction import crawl_pagerank_topk
    from ..operators.similarity import embedding_dedup_recall
    from ..operators.textstats import langid_confusion
    from ..streaming.docs_stream import q_stream_token_drift

    return {
        "embedding_dedup_recall": embedding_dedup_recall,
        "crawl_pagerank": crawl_pagerank_topk,
        "langid_confusion": langid_confusion,
        "dedup_cluster_hist": dedup_cluster_hist,
        "dedup_index_commit": dedup_index_commit,
        "bpe_vocab_coverage": bpe_vocab_coverage,
        "export_shards": export_shards,
        "source_perplexity_report": source_perplexity_report,
        "stream_token_drift": q_stream_token_drift,
        "quality_signal_agreement": quality_signal_agreement,
        "jaccard_threshold_curve": jaccard_threshold_curve,
        "lsh_banding_recall": lsh_banding_recall,
    }
