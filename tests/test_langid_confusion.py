"""langid_confusion (predicted-vs-labeled language confusion matrix) vs
an inline DuckDB oracle composed from the registered langid fragments,
plus conservation invariants (staged for round-10 registration per the
window contract)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.textstats import (
    LANG_STOPWORDS,
    langid_confusion,
)

from .oracle import assert_matches_oracle


def _confusion_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["langid_confusion"]


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        langid_confusion(spark, sf_correct), _confusion_sql(), sf_correct
    )


def test_conserves_and_reads_sane(spark, sf_smoke):
    """Cell counts conserve to the corpus; every row's ppm shares sum to
    ~1e6 (off only by per-cell rounding); predictions live in the known
    label set ∪ 'und'; the fixture must actually produce a non-trivial
    matrix (more than one distinct predicted language)."""
    from bigdata_infra_cs489_spark.sources.tables import load

    rows = langid_confusion(spark, sf_smoke).collect()
    n_docs = load(spark, sf_smoke, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    preds = {r["lang_pred"] for r in rows}
    assert preds <= set(LANG_STOPWORDS) | {"und"}
    assert len(preds) > 1
    by_true: dict[str, int] = {}
    cells: dict[str, int] = {}
    for r in rows:
        by_true[r["lang_true"]] = by_true.get(r["lang_true"], 0) + r["row_ppm"]
        cells[r["lang_true"]] = cells.get(r["lang_true"], 0) + 1
    for lang, s in by_true.items():
        assert abs(s - 1_000_000) <= cells[lang], lang
