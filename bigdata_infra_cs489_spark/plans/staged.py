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

The round-14 queue (incremental_repeat_spectrum) registered in
catalog.py during the round-15 rotation and holds slot 1 of the
round-15 driver window, per the protocol: a query lives either here
(staged, pytest-oracled) or in catalog.py (registered), never both.
Entries added during round 15 queue for the round-16 rotation; the
forward schedule in ``registry.py`` leaves 7 spare r16 slots (43 are
reserved for the r11-stale cohort the contract tripwire enumerates),
but keep the queue well under that — spare slots should pre-cover the
r12-cohort head (bigram_lm_perplexity .. dataset_split), and staged
entries displace pre-covers from the TAIL, never a stale slot.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def staged_queries() -> dict[str, QueryFn]:
    """name -> callable for every plan-auditable staged operator.

    Round-16 queue: EMPTY. The round-15 card
    (``contamination_scorecard``) registered in catalog.py at the r16
    rotation and holds slot 50 of the round-16 driver window; its
    oracle moved from tests/test_contamination_scorecard.py into
    catalog.py (the test now pins the registered oracle). Round 16 is
    an optimization round — no new operators are staged; entries added
    later queue for the round-17 rotation, whose spare capacity is 6
    slots (registry.py::_NEXT_WINDOW_PLAN tail, degree_distribution
    displaced first).
    """
    return {}
