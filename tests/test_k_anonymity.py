"""k-anonymity audit vs an inline DuckDB oracle plus monotonicity and
fixture-signal invariants (staged for round-8 registration per the
window contract)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.table_ops import (
    K_ANON_THRESHOLDS,
    k_anonymity_report,
)

from .oracle import assert_matches_oracle

_ARMS = "\n    UNION ALL ".join(
    f"""SELECT CAST({k} AS INT) AS k,
           CAST(count(*) AS BIGINT) AS n_cohorts,
           CAST(coalesce(sum(CASE WHEN c < {k} THEN 1 END), 0) AS BIGINT)
               AS n_small_cohorts,
           CAST(coalesce(sum(CASE WHEN c < {k} THEN c END), 0) AS BIGINT)
               AS n_users_at_risk,
           CAST((coalesce(sum(CASE WHEN c < {k} THEN c END), 0) * 1000000
                 + sum(c) // 2) // greatest(sum(c), 1) AS BIGINT) AS risk_ppm
    FROM cohorts"""
    for k in K_ANON_THRESHOLDS
)

# dominant type: max count, ties to the lexicographically LAST type —
# the (count, event_type) struct order the Spark max_by uses
_SQL = f"""
    WITH tc AS (
        SELECT user_id, event_type, count(*) AS c
        FROM events GROUP BY user_id, event_type),
    dom AS (
        SELECT user_id, event_type AS dom FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id
                          ORDER BY c DESC, event_type DESC) AS rn
            FROM tc)
        WHERE rn = 1),
    fd AS (
        SELECT user_id, strftime(min(ts), '%Y-%m-%d') AS first_day
        FROM events GROUP BY user_id),
    cohorts AS (
        SELECT first_day || ':' || dom AS qi, count(*) AS c
        FROM fd JOIN dom USING (user_id)
        GROUP BY 1)
    {_ARMS}
"""


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(k_anonymity_report(spark, sf_correct), _SQL, sf_correct)


def test_monotone_and_has_signal(spark, sf_correct):
    """Risk counts are monotone non-decreasing in k, n_cohorts is
    k-independent, risk_ppm reconciles, and the fixture must exercise
    BOTH a clean and an at-risk threshold or the oracle only ever sees
    zeros."""
    rows = {r["k"]: r for r in k_anonymity_report(spark, sf_correct).collect()}
    assert sorted(rows) == sorted(K_ANON_THRESHOLDS)
    ks = sorted(rows)
    assert len({rows[k]["n_cohorts"] for k in ks}) == 1
    for a, b in zip(ks, ks[1:]):
        assert rows[a]["n_small_cohorts"] <= rows[b]["n_small_cohorts"]
        assert rows[a]["n_users_at_risk"] <= rows[b]["n_users_at_risk"]
    assert rows[ks[0]]["n_users_at_risk"] == 0, "smallest k should be clean"
    assert rows[ks[-1]]["n_users_at_risk"] > 0, "largest k should flag users"
