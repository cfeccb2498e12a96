"""split_balance_report (stratum QA of the salted-hash split) vs an
inline DuckDB oracle plus conservation/threshold invariants (staged for
round-9 registration per the window contract)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.sampling import (
    TRAIN_PCT,
    VAL_PCT,
    split_balance_report,
)

from .oracle import assert_matches_oracle


def _report_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["split_balance_report"]


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        split_balance_report(spark, sf_correct), _report_sql(), sf_correct
    )


def test_conserves_and_reads_sane(spark, sf_smoke):
    """Counts conserve to the corpus; every stratum's expectation is the
    lang total times the split percentage; the fixture's hash split must
    not be catastrophically skewed (no stratum > 100% off)."""
    rows = split_balance_report(spark, sf_smoke).collect()
    from bigdata_infra_cs489_spark.sources.tables import load

    n_docs = load(spark, sf_smoke, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    pcts = {"train": TRAIN_PCT, "val": VAL_PCT, "test": 100 - TRAIN_PCT - VAL_PCT}
    lang_tot: dict[str, int] = {}
    for r in rows:
        lang_tot[r["lang"]] = lang_tot.get(r["lang"], 0) + r["n_docs"]
    for r in rows:
        assert r["expected_micro"] == lang_tot[r["lang"]] * pcts[r["split"]] * 10_000
        assert r["deviation_ppm"] <= 1_000_000, (r["split"], r["lang"])
