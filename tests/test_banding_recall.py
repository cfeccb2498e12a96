"""lsh_banding_recall (measured candidate recall of the MinHash banding
per true-Jaccard threshold) vs an inline DuckDB oracle composed from
the registered pair CTEs, plus monotonicity/ground-truth invariants
(staged for round-10 registration per the window contract)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.dedup import (
    LSH_RECALL_THRESHOLDS,
    lsh_banding_recall,
)

from .oracle import assert_matches_oracle


def _recall_sql() -> str:
    from bigdata_infra_cs489_spark.plans.catalog import DUCK_MINHASH_PAIR_CTES

    low = min(LSH_RECALL_THRESHOLDS)
    spine = ", ".join(str(t) for t in LSH_RECALL_THRESHOLDS)
    return f"""
    WITH {DUCK_MINHASH_PAIR_CTES},
    ng_ex AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM sh),
    tp AS (
        SELECT doc_a, doc_b,
               CAST(floor(round(c / (na + nb - c), 6) * 1000000 + 0.5)
                    AS BIGINT) AS j_micro
        FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.n_sh AS na, b.n_sh AS nb, count(*) AS c
            FROM ng_ex a JOIN ng_ex b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4)
        WHERE round(c / (na + nb - c), 6) >= {low / 100.0}),
    marked AS (
        SELECT tp.j_micro,
               CASE WHEN cd.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit
        FROM tp LEFT JOIN cand cd
          ON cd.doc_a = tp.doc_a AND cd.doc_b = tp.doc_b),
    spine AS (SELECT unnest([{spine}]) AS t_pct)
    SELECT CAST(t_pct AS INT) AS t_pct,
           CAST(count(*) AS BIGINT) AS n_true_pairs,
           CAST(sum(hit) AS BIGINT) AS n_caught,
           CAST((sum(hit) * 1000000 + count(*) // 2)
                // greatest(count(*), 1) AS BIGINT) AS recall_ppm
    FROM marked, spine
    WHERE j_micro >= t_pct * 10000
    GROUP BY t_pct
    """


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        lsh_banding_recall(spark, sf_correct), _recall_sql(), sf_correct
    )


def test_recall_monotone_and_grounded(spark, sf_correct):
    """Recall is monotone non-decreasing in the threshold (higher-J
    pairs are strictly easier for the banding to catch — probability
    1-(1-s^r)^b increases in s); true-pair counts are monotone
    non-increasing; at the registered 0.8+ regime recall must be high
    on the fixture's near-identical pairs; the card must include at
    least one threshold with imperfect recall OR more true pairs than
    candidates can trivially cover (i.e. the measurement is not
    vacuous)."""
    rows = sorted(
        lsh_banding_recall(spark, sf_correct).collect(),
        key=lambda r: r["t_pct"],
    )
    assert [r["t_pct"] for r in rows] == sorted(LSH_RECALL_THRESHOLDS)
    trues = [r["n_true_pairs"] for r in rows]
    recalls = [r["recall_ppm"] for r in rows]
    assert trues == sorted(trues, reverse=True)
    assert recalls == sorted(recalls)
    assert rows[0]["n_true_pairs"] > 0
    by_t = {r["t_pct"]: r for r in rows}
    assert by_t[90]["recall_ppm"] >= 900_000
    assert all(r["n_caught"] <= r["n_true_pairs"] for r in rows)
