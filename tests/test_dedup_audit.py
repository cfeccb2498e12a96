"""near_dup_method_audit (cross-method pair-set agreement matrix) vs an
inline DuckDB oracle composed from the four registered pair chains,
plus set-algebra invariants (staged for round-9 registration per the
window contract)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.dedup import (
    NEAR_DUP_METHODS,
    near_dup_method_audit,
)

from .oracle import assert_matches_oracle


def _audit_sql() -> str:
    from bigdata_infra_cs489_spark.operators import dedup as D
    from bigdata_infra_cs489_spark.plans.catalog import (
        DUCK_H8,
        DUCK_MINHASH_PAIR_CTES,
    )

    return f"""
    WITH {DUCK_MINHASH_PAIR_CTES},
    mh AS (SELECT doc_a, doc_b FROM pairs
           WHERE jaccard >= {D.JACCARD_THRESHOLD}),
    ng_ex AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM sh),
    ng AS (
        SELECT doc_a, doc_b FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.n_sh AS na, b.n_sh AS nb, count(*) AS c
            FROM ng_ex a JOIN ng_ex b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4)
        WHERE round(c / (na + nb - c), 6) >= 0.5),
    tf AS (SELECT doc_id, tok, count(*) AS tf
           FROM (SELECT doc_id, unnest(toks) AS tok FROM toks)
           GROUP BY doc_id, tok),
    hh AS (SELECT doc_id, tf, {DUCK_H8.format(x='tok')} AS h FROM tf),
    votes AS (
        SELECT doc_id, j, sum(tf * (((h >> j) & 1) * 2 - 1)) AS v
        FROM hh, unnest(range(0, {D.SIMHASH_BITS})) t(j)
        GROUP BY doc_id, j),
    fps AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END)
                    AS BIGINT) AS simhash
        FROM votes GROUP BY doc_id),
    sh_pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM fps a JOIN fps b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash))
              <= {D.HAMMING_THRESHOLD}),
    ed AS (
        SELECT doc_a, doc_b FROM cand
        JOIN documents da ON da.doc_id = doc_a
        JOIN documents db ON db.doc_id = doc_b
        WHERE round(1.0 - levenshtein(da.text, db.text)
              / greatest(len(da.text), len(db.text), 1), 6)
              >= {D.EDIT_SIM_MIN}),
    tagged AS (
        SELECT 'minhash' AS m, doc_a, doc_b FROM mh
        UNION ALL SELECT 'ngram', doc_a, doc_b FROM ng
        UNION ALL SELECT 'simhash', doc_a, doc_b FROM sh_pairs
        UNION ALL SELECT 'editdist', doc_a, doc_b FROM ed),
    methods AS (SELECT unnest(['editdist', 'minhash', 'ngram',
                               'simhash']) AS m),
    counted AS (SELECT m, CAST(count(*) AS BIGINT) AS n_obs
                FROM tagged GROUP BY m),
    sizes AS (SELECT methods.m, CAST(coalesce(n_obs, 0) AS BIGINT) AS n
              FROM methods LEFT JOIN counted USING (m)),
    inter AS (
        SELECT x.m AS ma, y.m AS mb, CAST(count(*) AS BIGINT) AS n_both
        FROM tagged x JOIN tagged y
          ON x.doc_a = y.doc_a AND x.doc_b = y.doc_b
        WHERE x.m <= y.m GROUP BY 1, 2),
    grid AS (
        SELECT a.m AS ma, a.n AS n_a, b.m AS mb, b.n AS n_b
        FROM sizes a, sizes b WHERE a.m <= b.m)
    SELECT ma AS method_a, mb AS method_b, n_a, n_b,
           CAST(coalesce(i.n_both, 0) AS BIGINT) AS n_both,
           CAST((coalesce(i.n_both, 0) * 1000000
                 + (n_a + n_b - coalesce(i.n_both, 0)) // 2)
                // greatest(n_a + n_b - coalesce(i.n_both, 0), 1) AS BIGINT)
               AS pair_jaccard_ppm
    FROM grid LEFT JOIN inter i USING (ma, mb)
    """


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        near_dup_method_audit(spark, sf_correct), _audit_sql(), sf_correct
    )


def test_set_algebra_invariants(spark, sf_correct):
    """Diagonal rows are full self-overlap (jaccard 1.0 when non-empty);
    off-diagonal intersections are bounded by both set sizes; the fixture
    must show real agreement between minhash and ngram (both verify true
    Jaccard, minhash at the stricter threshold, so minhash pairs are a
    subset of ngram pairs)."""
    rows = {
        (r["method_a"], r["method_b"]): r
        for r in near_dup_method_audit(spark, sf_correct).collect()
    }
    assert len(rows) == 10
    for m in NEAR_DUP_METHODS:
        r = rows[(m, m)]
        assert r["n_a"] == r["n_b"] == r["n_both"]
        if r["n_a"]:
            assert r["pair_jaccard_ppm"] == 1_000_000
    for (a, b), r in rows.items():
        assert r["n_both"] <= min(r["n_a"], r["n_b"])
    mn = rows[("minhash", "ngram")]
    assert mn["n_both"] == mn["n_a"], "0.8-Jaccard pairs must be 0.5-ngram pairs"
    assert mn["n_a"] > 0, "fixture must contain near-duplicate signal"
