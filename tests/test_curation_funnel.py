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
    from bigdata_infra_cs489_spark.operators import curate as CU
    from bigdata_infra_cs489_spark.operators import dedup as D
    from bigdata_infra_cs489_spark.plans.catalog import (
        _TEXT_QUALITY_SQL,
        DUCK_MINHASH_PAIR_CTES,
        DUCK_SPAN_TAIL_CTES,
    )

    stage_rows = []
    for i, name in enumerate(CURATE_FUNNEL_STAGES):
        drop = "CAST(0 AS BIGINT)" if i == 0 else f"CAST(d{i-1} - d{i} AS BIGINT)"
        stage_rows.append(
            f"SELECT CAST({i} AS INT) AS stage_no, '{name}' AS stage, "
            f"d{i} AS n_docs, t{i} AS n_tokens, {drop} AS dropped_docs "
            "FROM agg"
        )
    arms = "\n    UNION ALL ".join(stage_rows)
    return f"""
    WITH RECURSIVE {DUCK_MINHASH_PAIR_CTES},{DUCK_SPAN_TAIL_CTES},
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        WHERE jaccard >= {D.JACCARD_THRESHOLD}
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
        WHERE jaccard >= {D.JACCARD_THRESHOLD}),
    reach AS (
        SELECT doc_id AS src, doc_id AS dst FROM documents
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
    cl AS (SELECT src AS doc_id, min(dst) AS cluster_id
           FROM reach GROUP BY src),
    chars AS (SELECT doc_id, CAST(len(text) AS INT) AS n_chars FROM documents),
    reps AS (
        SELECT doc_id FROM (
            SELECT cl.doc_id,
                   row_number() OVER (PARTITION BY cl.cluster_id
                       ORDER BY chars.n_chars DESC, cl.doc_id ASC) AS rn
            FROM cl JOIN chars USING (doc_id))
        WHERE rn = 1),
    ex AS (
        SELECT doc_id FROM (
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY md5(text)) AS can
            FROM documents)
        WHERE doc_id = can),
    cov AS (SELECT doc_id, CAST(sum(span_len) AS BIGINT) AS dup_tokens
            FROM spans GROUP BY doc_id),
    alltoks AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM toks),
    sp AS (
        SELECT a.doc_id, a.n_tokens,
               coalesce(c.dup_tokens, CAST(0 AS BIGINT)) AS dup_tokens
        FROM alltoks a LEFT JOIN cov c USING (doc_id)),
    tq AS ({_TEXT_QUALITY_SQL}),
    kept AS (
        SELECT r.doc_id, sp.n_tokens - sp.dup_tokens AS kept_tokens,
               tq.quality_score
        FROM reps r
        JOIN ex USING (doc_id)
        JOIN sp USING (doc_id)
        JOIN tq USING (doc_id)
        WHERE tq.quality_score >= {CU.CURATE_MIN_QUALITY}
          AND sp.dup_tokens * {CU.CURATE_MAX_DUP_DEN} <= sp.n_tokens),
    packed AS (
        SELECT doc_id FROM (
            SELECT doc_id, sum(kept_tokens) OVER (
                       ORDER BY quality_score DESC, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
            FROM kept)
        WHERE cum <= {CU.CURATE_TOKEN_BUDGET}),
    f AS (
        SELECT d.doc_id, sp.n_tokens,
               ex.doc_id IS NOT NULL AS f1,
               ex.doc_id IS NOT NULL AND rp.doc_id IS NOT NULL AS f2,
               ex.doc_id IS NOT NULL AND rp.doc_id IS NOT NULL
                   AND tq.quality_score >= {CU.CURATE_MIN_QUALITY} AS f3,
               ex.doc_id IS NOT NULL AND rp.doc_id IS NOT NULL
                   AND tq.quality_score >= {CU.CURATE_MIN_QUALITY}
                   AND sp.dup_tokens * {CU.CURATE_MAX_DUP_DEN} <= sp.n_tokens
                   AS f4,
               pk.doc_id IS NOT NULL AS f5
        FROM (SELECT doc_id FROM documents) d
        JOIN sp USING (doc_id)
        JOIN tq USING (doc_id)
        LEFT JOIN ex ON ex.doc_id = d.doc_id
        LEFT JOIN reps rp ON rp.doc_id = d.doc_id
        LEFT JOIN packed pk ON pk.doc_id = d.doc_id),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS d0,
               CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS t0,
               CAST(coalesce(sum(CASE WHEN f1 THEN 1 END), 0) AS BIGINT) AS d1,
               CAST(coalesce(sum(CASE WHEN f1 THEN n_tokens END), 0)
                    AS BIGINT) AS t1,
               CAST(coalesce(sum(CASE WHEN f2 THEN 1 END), 0) AS BIGINT) AS d2,
               CAST(coalesce(sum(CASE WHEN f2 THEN n_tokens END), 0)
                    AS BIGINT) AS t2,
               CAST(coalesce(sum(CASE WHEN f3 THEN 1 END), 0) AS BIGINT) AS d3,
               CAST(coalesce(sum(CASE WHEN f3 THEN n_tokens END), 0)
                    AS BIGINT) AS t3,
               CAST(coalesce(sum(CASE WHEN f4 THEN 1 END), 0) AS BIGINT) AS d4,
               CAST(coalesce(sum(CASE WHEN f4 THEN n_tokens END), 0)
                    AS BIGINT) AS t4,
               CAST(coalesce(sum(CASE WHEN f5 THEN 1 END), 0) AS BIGINT) AS d5,
               CAST(coalesce(sum(CASE WHEN f5 THEN n_tokens END), 0)
                    AS BIGINT) AS t5
        FROM f)
    {arms}
    """


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
