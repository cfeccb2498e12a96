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

The round-12 queue (media_roundtrip_coverage,
incremental_training_export, bitext_margin_pairs) registered in
catalog.py during the round-13 rotation and holds slots 1-3 of the
round-13 driver window, per the protocol: a query lives either here
(staged, pytest-oracled) or in catalog.py (registered), never both.
Entries added during round 13 queue for the round-14 rotation; the
forward schedule in ``registry.py`` leaves ~6 spare r14 slots (44 are
reserved for the r8-stale cohort incl. the displaced
contamination_near), so keep the queue ≤ 6 and prefer SMALLER — spare
slots should pre-cover the r9-cohort head. The round-13 queue closed
at 2 (tokenizer_fertility, repeat_spectrum).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def staged_queries() -> dict[str, QueryFn]:
    """name -> callable for every plan-auditable staged operator."""
    from ..operators.bpe import tokenizer_fertility
    from ..operators.spans import repeat_spectrum

    return {
        # round-13 staging (round-12 verdict #5's preferred shape: ONE
        # high-value LLM-pipeline card, queue well under the ~6 spare
        # r14 slots): per-language BPE fertility / compression-rate
        # aggregate over the bpe_encode_stats per-doc counters — the
        # cross-language tokenizer-selection audit; exact integer micro
        # rates, no float finish; oracle composed from the registered
        # bpe_encode_stats twin in tests/test_tokenizer_fertility.py
        "tokenizer_fertility": tokenizer_fertility,
        # the round-12 verdict's OTHER named candidate (#5): the
        # suffix-array-style complement to the fixed-k span family —
        # all-scale exact-substring repetition via Rabin-Karp doubling
        # (one equi-join per width doubling, no global sorts); exact
        # integer counts, md5-chain oracle + TRUE tuple-counting replay
        # in tests/test_repeat_spectrum.py
        "repeat_spectrum": repeat_spectrum,
    }
