"""dedup_index_commit (next-generation cluster map: standing + assigned
+ fresh new-new clusters) vs an inline DuckDB oracle extending the
incremental-assign replay, plus partition/consistency invariants
(oracle single-sourced in plans/catalog.py since round-10 registration)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.dedup import (
    NEW_BATCH_MOD,
    dedup_index_commit,
    incremental_dedup_assign,
)

from .oracle import assert_matches_oracle


def _commit_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["dedup_index_commit"]


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
