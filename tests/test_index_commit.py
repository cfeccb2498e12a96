"""dedup_index_commit (next-generation cluster map: standing + assigned
+ fresh new-new clusters) vs an inline DuckDB oracle extending the
incremental-assign replay, plus partition/consistency invariants
(staged for round-10 registration per the window contract)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.dedup import (
    NEW_BATCH_MOD,
    dedup_index_commit,
    incremental_dedup_assign,
)

from .oracle import assert_matches_oracle


def _commit_sql() -> str:
    from bigdata_infra_cs489_spark.operators import dedup as D
    from bigdata_infra_cs489_spark.plans.catalog import (
        _NEW,
        _OLD,
        DUCK_MINHASH_PAIR_CTES,
    )

    t = D.JACCARD_THRESHOLD
    return f"""
    WITH RECURSIVE {DUCK_MINHASH_PAIR_CTES},
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        WHERE jaccard >= {t} AND doc_a {_OLD} AND doc_b {_OLD}
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
        WHERE jaccard >= {t} AND doc_a {_OLD} AND doc_b {_OLD}),
    reach AS (
        SELECT doc_id AS src, doc_id AS dst FROM documents
        WHERE doc_id {_OLD}
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
    oldcl AS (
        SELECT src AS doc_id, min(dst) AS cluster_id
        FROM reach GROUP BY src),
    newold AS (
        SELECT CASE WHEN doc_a {_NEW} THEN doc_a ELSE doc_b END AS new_id,
               CASE WHEN doc_a {_NEW} THEN doc_b ELSE doc_a END AS old_id,
               jaccard
        FROM pairs
        WHERE jaccard >= {t} AND (doc_a {_NEW}) <> (doc_b {_NEW})),
    best AS (
        SELECT new_id, old_id FROM (
          SELECT *, row_number() OVER (PARTITION BY new_id
                     ORDER BY jaccard DESC, old_id ASC) AS rn
          FROM newold) WHERE rn = 1),
    nn AS (
        SELECT doc_a, doc_b FROM pairs
        WHERE jaccard >= {t} AND doc_a {_NEW} AND doc_b {_NEW}
          AND doc_a NOT IN (SELECT new_id FROM best)
          AND doc_b NOT IN (SELECT new_id FROM best)),
    nedges AS (SELECT doc_a AS src, doc_b AS dst FROM nn
               UNION ALL SELECT doc_b, doc_a FROM nn),
    nreach AS (
        SELECT doc_id AS src, doc_id AS dst FROM documents
        WHERE doc_id {_NEW}
          AND doc_id NOT IN (SELECT new_id FROM best)
        UNION
        SELECT r.src, e.dst FROM nreach r JOIN nedges e ON r.dst = e.src),
    ncl AS (SELECT src AS doc_id, min(dst) AS cluster_id
            FROM nreach GROUP BY src)
    SELECT doc_id, cluster_id, 'old' AS origin FROM oldcl
    UNION ALL
    SELECT b.new_id AS doc_id, c.cluster_id, 'assigned' AS origin
    FROM best b JOIN oldcl c ON c.doc_id = b.old_id
    UNION ALL
    SELECT doc_id, cluster_id, 'new' AS origin FROM ncl
    """


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        dedup_index_commit(spark, sf_correct), _commit_sql(), sf_correct
    )


def test_commit_partitions_corpus_and_is_consistent(spark, sf_correct):
    """The committed map covers every doc exactly once; origins respect
    the batch convention; 'assigned' rows agree with
    incremental_dedup_assign verbatim; fresh clusters are keyed by
    their smallest member and never collide with matched docs; the
    fixture must exercise all three origins."""
    from bigdata_infra_cs489_spark.sources.tables import load

    rows = dedup_index_commit(spark, sf_correct).collect()
    n_docs = load(spark, sf_correct, "documents").count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    origins = {r["origin"] for r in rows}
    assert origins == {"old", "assigned", "new"}
    assign = {
        r["doc_id"]: r for r in incremental_dedup_assign(spark, sf_correct).collect()
    }
    fresh: dict[int, list[int]] = {}
    for r in rows:
        is_new = r["doc_id"] % NEW_BATCH_MOD == NEW_BATCH_MOD - 1
        if r["origin"] == "old":
            assert not is_new
        else:
            assert is_new
            a = assign[r["doc_id"]]
            if r["origin"] == "assigned":
                assert a["matched"] == 1
                assert r["cluster_id"] == a["cluster_id"]
            else:
                assert a["matched"] == 0
                fresh.setdefault(r["cluster_id"], []).append(r["doc_id"])
    assert fresh
    for cid, members in fresh.items():
        assert cid == min(members)
