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

The round-13 queue (tokenizer_fertility, repeat_spectrum) registered in
catalog.py during the round-14 rotation and holds slots 1-2 of the
round-14 driver window, per the protocol: a query lives either here
(staged, pytest-oracled) or in catalog.py (registered), never both.
Entries added during round 14 queue for the round-15 rotation; the
forward schedule in ``registry.py`` leaves only 3 spare r15 slots (47
are reserved for the r9-stale cohort the contract tripwire enumerates),
so keep the queue ≤ 3 and prefer SMALLER — spare slots should pre-cover
the r11-cohort head (bigram_rel_freq, bigram_stripes, bm25_retrieval).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def staged_queries() -> dict[str, QueryFn]:
    """name -> callable for every plan-auditable staged operator.

    Round-14 queue (1 of the 3 spare r15 slots; displaces the
    bm25_retrieval pre-cover in _NEXT_WINDOW_PLAN, never an r9-stale
    slot):

    - ``incremental_repeat_spectrum`` — the repeat-spectrum family's
      recurring path: the new crawl batch's all-scale repetition against
      the standing corpus's per-width context-id asset
      (operators/spans.py::standing_old_contexts). Oracle single-sourced
      in tests/test_incremental_repeat_spectrum.py (inline md5-chain
      replay; the asset is an execution strategy, not a semantic input),
      plus a true token-tuple replay and the asset==inline pin.
    """
    from ..operators import spans as SP

    return {
        "incremental_repeat_spectrum": SP.incremental_repeat_spectrum,
    }
