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

    Round-15 queue (1 of the 7 spare r16 slots; displaces the
    dataset_split pre-cover in _NEXT_WINDOW_PLAN's tail, never an
    r11-stale slot):

    - ``contamination_scorecard`` — the cross-eval-suite
      decontamination report: the three registered contamination legs
      (exact shingles, banded-MinHash fuzzy, position-level spans)
      aggregated per eval suite (suite = held-out docs' lang), one row
      per suite (operators/spans.py::contamination_scorecard). Oracle
      single-sourced in tests/test_contamination_scorecard.py
      (suite-grouped replay of the three leg oracles), plus a
      single-suite reconciliation against the registered legs and a
      crafted hand-checkable corpus.
    """
    from ..operators import spans as SP

    return {
        "contamination_scorecard": SP.contamination_scorecard,
    }
