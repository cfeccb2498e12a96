"""corpus_curate_v2 (the flagship pipeline + the round-7 families as
stages) vs an inline DuckDB oracle composed from the same single-sourced
catalog fragments, plus stage-consistency pinning against corpus_curate
(staged for round-8 registration per the window contract)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.curate import (
    CURATE_GOPHER_RULES,
    CURATE_MAX_DUP_DEN,
    CURATE_MIN_QUALITY,
    CURATE_TOKEN_BUDGET,
    corpus_curate,
    corpus_curate_v2,
)

from .oracle import assert_matches_oracle
from .test_linededup import _DUCK_LINES


def _v2_sql() -> str:
    from bigdata_infra_cs489_spark.operators import curate as CU
    from bigdata_infra_cs489_spark.operators import dedup as D
    from bigdata_infra_cs489_spark.operators import linededup as LD
    from bigdata_infra_cs489_spark.operators import sampling as SA
    from bigdata_infra_cs489_spark.plans.catalog import (
        _PII_STAGED_COUNTS,
        _TEXT_QUALITY_SQL,
        DUCK_GOPHER_FLAGS,
        DUCK_H8,
        DUCK_MINHASH_PAIR_CTES,
        DUCK_PII_DECORATED,
        DUCK_SPAN_TAIL_CTES,
    )

    split_hash = DUCK_H8.format(
        x=f"CAST(cluster_id AS VARCHAR) || '{SA.CLUSTER_SPLIT_SALT}'"
    )
    gate = " AND ".join(f"gof.{r}" for r in CURATE_GOPHER_RULES)
    gof_cols = ", ".join(CURATE_GOPHER_RULES)
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
    cl AS (
        SELECT src AS doc_id, min(dst) AS cluster_id
        FROM reach GROUP BY src),
    chars AS (SELECT doc_id, CAST(len(text) AS INT) AS n_chars FROM documents),
    reps AS (
        SELECT cluster_id, doc_id, CAST(cluster_size AS BIGINT) AS cluster_size
        FROM (
            SELECT cl.cluster_id, cl.doc_id,
                   row_number() OVER (PARTITION BY cl.cluster_id
                       ORDER BY chars.n_chars DESC, cl.doc_id ASC) AS rn,
                   count(*) OVER (PARTITION BY cl.cluster_id) AS cluster_size
            FROM cl JOIN chars USING (doc_id))
        WHERE rn = 1),
    ex AS (
        SELECT doc_id FROM (
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY md5(text)) AS can
            FROM documents)
        WHERE doc_id = can),
    splits AS (
        SELECT doc_id,
               CASE WHEN {split_hash} % 100 < {SA.TRAIN_PCT} THEN 'train'
                    WHEN {split_hash} % 100 < {SA.TRAIN_PCT + SA.VAL_PCT}
                        THEN 'val'
                    ELSE 'test' END AS split
        FROM cl),
    cov AS (SELECT doc_id, CAST(sum(span_len) AS BIGINT) AS dup_tokens
            FROM spans GROUP BY doc_id),
    alltoks AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM toks),
    sp AS (
        SELECT a.doc_id, a.n_tokens,
               coalesce(c.dup_tokens, CAST(0 AS BIGINT)) AS dup_tokens
        FROM alltoks a LEFT JOIN cov c USING (doc_id)),
    tq AS ({_TEXT_QUALITY_SQL}),
    gof AS (SELECT doc_id, {gof_cols} FROM ({DUCK_GOPHER_FLAGS})),
    piir AS (
        SELECT doc_id,
               CAST({" + ".join(_PII_STAGED_COUNTS)} AS BIGINT) AS n_redactions
        FROM ({DUCK_PII_DECORATED}) dec),
    {_DUCK_LINES.lstrip()},
    ldg AS (SELECT line, min(doc_id * {LD.POS_ENC} + line_no) AS first_pos
            FROM lines GROUP BY line),
    ldk AS (SELECT l.doc_id, CAST(count(*) AS BIGINT) AS kept_lines
            FROM lines l JOIN ldg USING (line)
            WHERE l.doc_id * {LD.POS_ENC} + l.line_no = ldg.first_pos
            GROUP BY l.doc_id),
    ldt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines
            FROM lines GROUP BY doc_id),
    ld AS (
        SELECT d.doc_id,
               CAST(coalesce(t.n_lines, 0) - coalesce(k.kept_lines, 0)
                    AS BIGINT) AS dup_lines
        FROM (SELECT doc_id FROM documents) d
        LEFT JOIN ldt t USING (doc_id)
        LEFT JOIN ldk k USING (doc_id)),
    kept AS (
        SELECT r.doc_id, r.cluster_id, r.cluster_size, s.split,
               sp.n_tokens, sp.dup_tokens,
               sp.n_tokens - sp.dup_tokens AS kept_tokens,
               tq.quality_score,
               CAST(coalesce(piir.n_redactions, 0) AS BIGINT) AS n_redactions,
               ld.dup_lines
        FROM reps r
        JOIN ex USING (doc_id)
        JOIN splits s USING (doc_id)
        JOIN sp USING (doc_id)
        JOIN tq USING (doc_id)
        JOIN gof USING (doc_id)
        LEFT JOIN piir USING (doc_id)
        JOIN ld USING (doc_id)
        WHERE tq.quality_score >= {CU.CURATE_MIN_QUALITY}
          AND sp.dup_tokens * {CU.CURATE_MAX_DUP_DEN} <= sp.n_tokens
          AND {gate}),
    packed AS (
        SELECT *, sum(kept_tokens) OVER (
                   ORDER BY quality_score DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_kept_tokens
        FROM kept)
    SELECT doc_id, cluster_id, cluster_size, split, n_tokens, dup_tokens,
           CAST(kept_tokens AS BIGINT) AS kept_tokens, quality_score,
           n_redactions, dup_lines,
           CAST(cum_kept_tokens AS BIGINT) AS cum_kept_tokens
    FROM packed WHERE cum_kept_tokens <= {CU.CURATE_TOKEN_BUDGET}
    """


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        corpus_curate_v2(spark, sf_correct), _v2_sql(), sf_correct
    )


def test_v2_is_v1_plus_gates_and_audit(spark, sf_correct):
    """Stage-consistency pinning: v2's kept set must be a subset of what
    v1 would keep under the same budget-free gates (the extra Gopher
    gate only removes), every surviving row must agree with v1 on the
    shared columns, pass the configured rules, and the audit columns
    must be sane (dup_lines <= its own window count, n_redactions >= 0);
    the greedy budget re-packs over the smaller kept set."""
    v1 = {r["doc_id"]: r for r in corpus_curate(spark, sf_correct).collect()}
    v2 = {r["doc_id"]: r for r in corpus_curate_v2(spark, sf_correct).collect()}
    assert v2, "v2 gate must not empty the fixture corpus"
    shared = [
        "cluster_id",
        "cluster_size",
        "split",
        "n_tokens",
        "dup_tokens",
        "kept_tokens",
        "quality_score",
    ]
    # v2 admits docs v1's budget cut (smaller kept set packs further), so
    # compare only on the intersection; gate-survivor agreement is what
    # matters.
    for d in set(v1) & set(v2):
        for c in shared:
            assert v1[d][c] == v2[d][c], (d, c)
    for d, r in v2.items():
        assert r["n_redactions"] >= 0
        assert 0 <= r["dup_lines"]
        assert r["cum_kept_tokens"] <= CURATE_TOKEN_BUDGET
        assert r["quality_score"] >= CURATE_MIN_QUALITY
        assert r["dup_tokens"] * CURATE_MAX_DUP_DEN <= r["n_tokens"]


def test_gopher_gate_actually_fires(spark, sf_correct):
    """The configured rule set must exclude at least one document that
    passed every v1 gate — otherwise v2 demonstrates nothing beyond v1
    on this fixture."""
    from bigdata_infra_cs489_spark.operators.curate import _curate_gated
    from bigdata_infra_cs489_spark.operators.docquality import gopher_metrics
    from bigdata_infra_cs489_spark.sources.tables import load

    import pyspark.sql.functions as F

    docs = load(spark, sf_correct, "documents").select("doc_id", "text")
    gates = gopher_metrics(docs).select("doc_id", *CURATE_GOPHER_RULES)
    joined = _curate_gated(spark, sf_correct).join(gates, "doc_id")
    cond = None
    for r in CURATE_GOPHER_RULES:
        c = ~F.col(r)
        cond = c if cond is None else (cond | c)
    assert joined.where(cond).count() > 0
