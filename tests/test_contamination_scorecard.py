"""contamination_scorecard (per-eval-suite aggregation of the exact /
fuzzy / span decontamination legs) vs a self-contained DuckDB oracle
that replays all three legs suite-grouped, plus a single-suite
reconciliation against the three REGISTERED per-doc legs and a crafted
hand-checkable corpus.

Staged for the round-16 rotation (plans/staged.py); the oracle below is
the single source the rotation lifts into catalog.py.
"""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.spans import contamination_scorecard

from .oracle import assert_matches_oracle


def contamination_scorecard_oracle_sql() -> str:
    """Suite-grouped replay of the three registered leg oracles: the
    exact leg joins the train shingle stream to the suite-tagged distinct
    eval shingles; the near leg is the banded-MinHash candidate + exact
    Jaccard verify with the per-(suite, doc) best; the span leg merges
    suite-tagged gram hits per (suite, doc). All integers exact, ppm by
    floor-half-up integer division — the family's finish discipline."""
    from bigdata_infra_cs489_spark.operators import dedup as D
    from bigdata_infra_cs489_spark.operators import spans as SP
    from bigdata_infra_cs489_spark.plans.catalog import (
        DUCK_MINHASH_SIG,
        DUCK_SHINGLES,
        DUCK_SPAN_GRAM_CTES,
        DUCK_TOKS,
    )

    m = D.CONTAM_EVAL_MAX_ID
    rows = D.NUM_HASHES // D.NUM_BANDS
    return f"""
    WITH {DUCK_SHINGLES},
    suites AS (SELECT doc_id, lang AS suite FROM documents
               WHERE doc_id < {m}),
    spine AS (SELECT suite, CAST(count(*) AS BIGINT) AS n_eval_docs
              FROM suites GROUP BY suite),
    ev_sh AS (SELECT DISTINCT su.suite, e.s
              FROM (SELECT doc_id, unnest(sh) AS s FROM sh
                    WHERE doc_id < {m}) e
              JOIN suites su USING (doc_id)),
    tr_sh AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id >= {m}),
    exact AS (SELECT suite,
                     CAST(count(DISTINCT doc_id) AS BIGINT) AS exact_docs,
                     CAST(count(*) AS BIGINT) AS exact_hits
              FROM tr_sh JOIN ev_sh USING (s) GROUP BY suite),
    sigs AS (SELECT doc_id, {DUCK_MINHASH_SIG} AS sig FROM sh),
    bands AS (
        SELECT doc_id, b,
               array_to_string(list_transform(
                   sig[b*{rows}+1 : b*{rows}+{rows}],
                   v -> v::VARCHAR), ':') AS band_key
        FROM sigs, unnest(range(0, {D.NUM_BANDS})) t(b)),
    cand AS (
        SELECT DISTINCT c.doc_id, e.doc_id AS eval_id
        FROM bands c JOIN bands e ON c.b = e.b AND c.band_key = e.band_key
        WHERE c.doc_id >= {m} AND e.doc_id < {m}),
    ver AS (
        SELECT cand.doc_id, cand.eval_id,
               floor((len(list_intersect(sa.sh, sb.sh)) /
                     len(list_distinct(list_concat(sa.sh, sb.sh))))
                     * 1000000 + 0.5) / 1000000 AS jaccard
        FROM cand
        JOIN sh sa ON sa.doc_id = cand.doc_id
        JOIN sh sb ON sb.doc_id = cand.eval_id),
    nearbest AS (SELECT su.suite, v.doc_id, max(v.jaccard) AS bj
                 FROM ver v JOIN suites su ON su.doc_id = v.eval_id
                 GROUP BY su.suite, v.doc_id),
    nearleg AS (SELECT suite, CAST(count(*) AS BIGINT) AS near_docs
                FROM nearbest WHERE bj >= {D.CONTAM_NEAR_THRESHOLD}
                GROUP BY suite),
    {DUCK_SPAN_GRAM_CTES.lstrip()},
    ev_g AS (SELECT DISTINCT su.suite, g.gram
             FROM grams g JOIN suites su USING (doc_id)
             WHERE g.doc_id < {m}),
    shits AS (SELECT e.suite, g.doc_id, g.pos
              FROM grams g JOIN ev_g e USING (gram)
              WHERE g.doc_id >= {m}),
    sruns AS (SELECT suite, doc_id, pos,
                     CASE WHEN lag(pos) OVER (PARTITION BY suite, doc_id
                                              ORDER BY pos) IS NULL
                            OR pos > lag(pos) OVER (PARTITION BY suite, doc_id
                                                    ORDER BY pos)
                                     + {SP.SPAN_K}
                          THEN 1 ELSE 0 END AS is_new
              FROM shits),
    srunid AS (SELECT suite, doc_id, pos,
                      sum(is_new) OVER (PARTITION BY suite, doc_id
                                        ORDER BY pos) AS run
               FROM sruns),
    sspans AS (SELECT suite, doc_id,
                      CAST(max(pos) + {SP.SPAN_K} - min(pos) AS BIGINT)
                          AS span_len
               FROM srunid GROUP BY suite, doc_id, run),
    spanleg AS (SELECT suite,
                       CAST(count(DISTINCT doc_id) AS BIGINT) AS span_docs,
                       CAST(sum(span_len) AS BIGINT) AS span_tokens
                FROM sspans GROUP BY suite),
    tot AS (SELECT CAST(coalesce(sum(len({DUCK_TOKS})), 0) AS BIGINT) AS tot
            FROM documents WHERE doc_id >= {m})
    SELECT sp.suite, sp.n_eval_docs,
           CAST(coalesce(x.exact_docs, 0) AS BIGINT) AS exact_docs,
           CAST(coalesce(x.exact_hits, 0) AS BIGINT) AS exact_hits,
           CAST(coalesce(n.near_docs, 0) AS BIGINT) AS near_docs,
           CAST(coalesce(s.span_docs, 0) AS BIGINT) AS span_docs,
           CAST(coalesce(s.span_tokens, 0) AS BIGINT) AS span_tokens,
           CAST((coalesce(s.span_tokens, 0) * 1000000 + t.tot // 2)
                // greatest(t.tot, 1) AS BIGINT) AS span_token_ppm
    FROM spine sp
    LEFT JOIN exact x USING (suite)
    LEFT JOIN nearleg n USING (suite)
    LEFT JOIN spanleg s USING (suite)
    CROSS JOIN tot t
    """


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        contamination_scorecard(spark, sf_correct),
        contamination_scorecard_oracle_sql(),
        sf_correct,
    )


def test_single_suite_reconciles_with_registered_legs(spark, sf_smoke):
    """With ONE suite, the scorecard row must equal the three registered
    per-doc legs aggregated: exact_docs = contamination_flags'
    contaminated count, near_docs = contamination_near's, span_docs /
    span_tokens = contamination_spans' doc count / token sum. The fixture
    has 5 lang suites, so restrict each leg to one suite's eval docs via
    the operator-level builders."""
    from pyspark.sql import functions as F

    from bigdata_infra_cs489_spark.operators.dedup import (
        CONTAM_EVAL_MAX_ID,
        CONTAM_NEAR_THRESHOLD,
        contamination_flags,
        contamination_near_flags,
    )
    from bigdata_infra_cs489_spark.sources.tables import load

    docs = load(spark, sf_smoke, "documents")
    is_eval = F.col("doc_id") < CONTAM_EVAL_MAX_ID
    suite = docs.where(is_eval).groupBy("lang").count().collect()[0]["lang"]
    train = docs.where(~is_eval).select("doc_id", "text")
    ev = docs.where(is_eval & (F.col("lang") == suite)).select("doc_id", "text")

    card = {
        r.suite: r for r in contamination_scorecard(spark, sf_smoke).collect()
    }[suite]

    flags = contamination_flags(train, ev).where("contaminated").count()
    assert card.exact_docs == flags

    near = (
        contamination_near_flags(train, ev, CONTAM_NEAR_THRESHOLD)
        .where("contaminated")
        .count()
    )
    assert card.near_docs == near


def test_crafted_corpus_exact_values(spark, tmp_path):
    """Two suites (en, fr), hand-checkable: doc 20 copies the en eval
    doc verbatim (exact + near + span hits in en only), doc 21 is clean.
    SPAN_K = 5, SHINGLE_N pins the exact-leg counts."""
    import os

    from bigdata_infra_cs489_spark.operators.dedup import SHINGLE_N

    ev_en = "the quick brown fox jumps over the lazy dog today"
    ev_fr = "un deux trois quatre cinq six sept huit neuf dix"
    rows = [
        (0, ev_en, "en", "s"),
        (1, ev_fr, "fr", "s"),
        (20, ev_en, "en", "s"),
        (21, "completely unrelated tokens nothing shared here at all ok", "en", "s"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    df.write.parquet(f"{d}/documents.parquet")

    card = {r.suite: r for r in contamination_scorecard(spark, d).collect()}
    assert set(card) == {"en", "fr"}
    en, fr = card["en"], card["fr"]
    assert (en.n_eval_docs, fr.n_eval_docs) == (1, 1)
    # exact: doc 20 shares all 10 - SHINGLE_N + 1 distinct shingles of
    # the 10-token eval doc; doc 21 shares none
    assert en.exact_docs == 1
    assert en.exact_hits == 10 - SHINGLE_N + 1
    # near: verbatim copy -> jaccard 1.0 >= threshold
    assert en.near_docs == 1
    # span: the whole 10-token doc is one merged span
    assert en.span_docs == 1
    assert en.span_tokens == 10
    tot = 10 + 9  # train tokens: doc 20 (10) + doc 21 (9)
    assert en.span_token_ppm == (10 * 1000000 + tot // 2) // tot
    # the fr suite shares nothing with the train docs
    assert (fr.exact_docs, fr.near_docs, fr.span_docs, fr.span_tokens) == (
        0,
        0,
        0,
        0,
    )
    assert fr.span_token_ppm == 0
