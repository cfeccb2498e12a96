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
    from bigdata_infra_cs489_spark.operators import sampling as SA
    from bigdata_infra_cs489_spark.plans.catalog import DUCK_H8

    h = DUCK_H8.format(x=f"(CAST(doc_id AS VARCHAR) || '{SA.SPLIT_SALT}')")
    return f"""
    WITH s AS (
        SELECT doc_id, lang,
               CASE WHEN ({h}) % 100 < {TRAIN_PCT} THEN 'train'
                    WHEN ({h}) % 100 < {TRAIN_PCT + VAL_PCT} THEN 'val'
                    ELSE 'test' END AS split
        FROM documents),
    per AS (SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs
            FROM s GROUP BY split, lang),
    lt AS (SELECT lang, CAST(count(*) AS BIGINT) AS lang_docs
           FROM s GROUP BY lang),
    spine AS (
        SELECT sp.split, lt.lang, lt.lang_docs,
               CAST(coalesce(per.n_docs, 0) AS BIGINT) AS n_docs
        FROM (SELECT unnest(['train', 'val', 'test']) AS split) sp
        CROSS JOIN lt
        LEFT JOIN per ON per.split = sp.split AND per.lang = lt.lang)
    SELECT p.split, p.lang, p.n_docs,
           CAST(lt.lang_docs
                * (CASE p.split WHEN 'train' THEN {TRAIN_PCT}
                                WHEN 'val' THEN {VAL_PCT}
                                ELSE {100 - TRAIN_PCT - VAL_PCT} END)
                * 10000 AS BIGINT) AS expected_micro,
           CAST(abs(p.n_docs * 1000000 - lt.lang_docs
                    * (CASE p.split WHEN 'train' THEN {TRAIN_PCT}
                                    WHEN 'val' THEN {VAL_PCT}
                                    ELSE {100 - TRAIN_PCT - VAL_PCT} END)
                    * 10000) * 1000000
                // greatest(lt.lang_docs
                    * (CASE p.split WHEN 'train' THEN {TRAIN_PCT}
                                    WHEN 'val' THEN {VAL_PCT}
                                    ELSE {100 - TRAIN_PCT - VAL_PCT} END)
                    * 10000, 1) AS BIGINT) AS deviation_ppm
    FROM spine p, lt WHERE lt.lang = p.lang
    """


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
