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

The round-9 queue (the embedding recall card, crawl PageRank, langid
confusion, cluster histogram, index commit, BPE vocab coverage, shard
export, source perplexity, streaming token drift, quality-signal
agreement, and the LSH tuning pair — 12 queries) registered in the
round-10 rotation. Entries added below during round 10 queue for the
round-11 rotation; keep the queue ≤ 11 slots (the pre-committed r11
window in ``registry.py`` reserves 39 slots for the r6-stale cohort),
and prefer a SMALLER queue — every spare r11 slot should pre-cover the
r7-cohort head so the 50-query r7 deadline doesn't consume the entire
r12 window.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def staged_queries() -> dict[str, QueryFn]:
    """name -> callable for every plan-auditable staged operator."""
    from ..operators.curate import training_export
    from ..operators.multimodal import media_strict_coverage

    return {
        # the round-10 stretch (round-9 verdict #8): shard layout x
        # split balance x sequence layout over the curated corpus in one
        # exactly-reconciling release card; oracle + invariants in
        # tests/test_training_export.py
        "training_export": training_export,
        # strict-mode decode coverage per modality, MEASURED by
        # attempting the real PNG/WAV/JPEG decodes (round-9 verdict #6's
        # coverage-card leg, on top of the shipped JPEG codec); oracle +
        # all-statuses classification test in tests/test_multimodal.py
        "media_strict_coverage": media_strict_coverage,
    }
