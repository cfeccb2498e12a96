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
queries) registered in the round-8 rotation; the queue is currently
empty. New operators built this round append here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def staged_queries() -> dict[str, QueryFn]:
    """name -> callable for every plan-auditable staged operator."""
    return {}
