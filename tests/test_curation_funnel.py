"""curation_funnel (per-stage survivor card of the corpus_curate chain)
vs an inline DuckDB oracle composed from the registered curate fragments,
plus exact consistency with corpus_curate's own output (staged for
round-9 registration per the window contract)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.curate import (
    CURATE_FUNNEL_STAGES,
    corpus_curate,
    curation_funnel,
)

from .oracle import assert_matches_oracle


def _funnel_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["curation_funnel"]


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        curation_funnel(spark, sf_correct), _funnel_sql(), sf_correct
    )


def test_funnel_is_monotone_and_consistent(spark, sf_correct):
    """Survivor counts are monotone non-increasing, dropped_docs telescopes
    exactly, the final stage equals corpus_curate's own output row count,
    and every stage must actually drop something on the fixture (the
    funnel demonstrates nothing if a gate never fires)."""
    rows = sorted(
        curation_funnel(spark, sf_correct).collect(), key=lambda r: r["stage_no"]
    )
    assert [r["stage"] for r in rows] == list(CURATE_FUNNEL_STAGES)
    for a, b in zip(rows, rows[1:]):
        assert b["n_docs"] <= a["n_docs"]
        assert b["n_tokens"] <= a["n_tokens"]
        assert b["dropped_docs"] == a["n_docs"] - b["n_docs"]
    assert rows[-1]["n_docs"] == corpus_curate(spark, sf_correct).count()
    assert rows[0]["n_docs"] > rows[-1]["n_docs"]
