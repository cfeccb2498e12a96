"""The round-8 registration queue, single-sourced.

Operators built and value-verified in round 7 whose ``register()`` is
deferred to the next window rotation (the driver checks exactly the
first 50 ``queries()`` entries, and the round-7 window is committed to
the 6 new registrations + the 44-query staleness cohort — see
``registry.py``'s rotation notes and ``tests/test_registry_contract.py``
for the mechanized contract).

Consumers:
- ``tests/test_plan_hygiene.py`` holds every entry here to the same
  plan bar as the registry (no row-at-a-time Python, no partition-less
  window, vectorized scans) so the queue can't regress while it waits;
- ``tools/plan_audit.py`` appends a staged section to PLAN_AUDIT.md;
- the round-8 rotation lifts each entry into ``catalog.py`` with the
  oracle SQL already written in its family's test file (or composed
  from catalog fragments), plus ``stream_line_dedup`` /
  ``quality_model_*`` whose plans are stream/loop post-hoc (excluded
  here for the registry's own ITERATIVE rationale, verified by their
  tests).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def staged_queries() -> dict[str, QueryFn]:
    """name -> callable for every plan-auditable staged operator."""
    from ..operators.curate import corpus_curate_v2
    from ..operators.dedup import q_contamination_near
    from ..operators.dsir import dsir_resample
    from ..operators.extraction import html_extract, html_link_edges
    from ..operators.linededup import (
        dup_line_stats,
        incremental_line_dedup,
        line_dedup_corpus,
    )
    from ..operators.qualitymodel import quality_model_scores
    from ..operators.similarity import rp_projected, rp_recall_topk
    from ..operators.table_ops import k_anonymity_report
    from ..operators.textstats import pack_manifest

    return {
        "dsir_resample": dsir_resample,
        "dup_line_stats": dup_line_stats,
        "line_dedup_corpus": line_dedup_corpus,
        "incremental_line_dedup": incremental_line_dedup,
        "contamination_near": q_contamination_near,
        "quality_model_scores": quality_model_scores,
        "corpus_curate_v2": corpus_curate_v2,
        "html_extract": html_extract,
        "html_link_edges": html_link_edges,
        "rp_projected": rp_projected,
        "rp_recall_topk": rp_recall_topk,
        "pack_manifest": pack_manifest,
        "k_anonymity_report": k_anonymity_report,
    }
