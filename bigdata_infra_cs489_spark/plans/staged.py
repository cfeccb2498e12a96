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

The round-10 queue (training_export, media_strict_coverage) registered
in catalog.py during round 11 and holds slots 1-2 of the round-12
driver window — the queue is EMPTY again, per the protocol: a query
lives either here (staged, pytest-oracled) or in catalog.py
(registered), never both. Entries added during round 12 queue for the
round-13 rotation; the forward schedule in ``registry.py`` leaves ~9
spare r13 slots (41 are reserved for the r7-stale cohort), so keep the
queue ≤ 9 and prefer SMALLER — spare slots should pre-cover the
r8-cohort head.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def staged_queries() -> dict[str, QueryFn]:
    """name -> callable for every plan-auditable staged operator."""
    from ..operators.curate import incremental_training_export
    from ..operators.multimodal import media_roundtrip_coverage
    from ..operators.similarity import bitext_margin_pairs

    return {
        # the round-11 verdict's #5 (carried from round 10 #2): full
        # JPEG/PNG/WAV decode paths with non-zero 'decoded' evidence per
        # modality — engine-encoded synthetic payloads classified by
        # the real decoders; oracle + all-legs test in
        # tests/test_multimodal.py
        "media_roundtrip_coverage": media_roundtrip_coverage,
        # the round-10 verdict's #8 stretch (carried to round-11 #8):
        # append-only delta shards of the training export, exactly
        # reconciled against the full card; oracle + append invariants
        # in tests/test_incremental_export.py
        "incremental_training_export": incremental_training_export,
        # round-12 continuation: margin-based bitext mining (Artetxe &
        # Schwenk ratio margin over the deterministic hash embedding,
        # mutual top-k per language pair, fixed salted anchor panel) —
        # the parallel-corpus harvesting step of a multilingual LLM
        # pipeline; oracle + python replay in tests/test_bitext.py
        "bitext_margin_pairs": bitext_margin_pairs,
    }
