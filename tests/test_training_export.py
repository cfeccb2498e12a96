"""training_export (the one-card training-run export: shard layout x
split balance x sequence layout over the curated corpus) vs an inline
DuckDB oracle wrapping the registered corpus_curate twin, plus exact
reconciliation invariants and a pure-Python replay (staged for the
round-11 registration per the window contract)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.curate import (
    SHARD_TOKENS,
    corpus_curate,
    export_shards,
    training_export,
)
from bigdata_infra_cs489_spark.operators.textstats import SEQ_LEN

from .oracle import assert_matches_oracle


def _export_sql() -> str:
    import __spark_entry__ as entrymod

    base = entrymod.oracle_sql()["corpus_curate"]
    cap, seq = SHARD_TOKENS, SEQ_LEN
    return f"""
    WITH base AS ({base}),
    tot AS (SELECT CAST(sum(kept_tokens) AS BIGINT) AS total_tokens
            FROM base),
    sh AS (SELECT doc_id, split, kept_tokens,
                  CAST((cum_kept_tokens - kept_tokens) // {cap} AS BIGINT)
                      AS shard_id
           FROM base),
    agg AS (
        SELECT shard_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(kept_tokens) AS BIGINT) AS shard_tokens,
               CAST(coalesce(sum(CASE WHEN split = 'train' THEN 1 END), 0)
                    AS BIGINT) AS train_docs,
               CAST(coalesce(sum(CASE WHEN split = 'val' THEN 1 END), 0)
                    AS BIGINT) AS val_docs,
               CAST(coalesce(sum(CASE WHEN split = 'test' THEN 1 END), 0)
                    AS BIGINT) AS test_docs,
               CAST(coalesce(sum(CASE WHEN split = 'train'
                                      THEN kept_tokens END), 0)
                    AS BIGINT) AS train_tokens,
               CAST(coalesce(sum(CASE WHEN split = 'val'
                                      THEN kept_tokens END), 0)
                    AS BIGINT) AS val_tokens,
               CAST(coalesce(sum(CASE WHEN split = 'test'
                                      THEN kept_tokens END), 0)
                    AS BIGINT) AS test_tokens
        FROM sh GROUP BY shard_id)
    SELECT a.shard_id, a.n_docs, a.shard_tokens,
           a.train_docs, a.val_docs, a.test_docs,
           a.train_tokens, a.val_tokens, a.test_tokens,
           CAST(least((a.shard_id + 1) * {cap}, t.total_tokens)
                - a.shard_id * {cap} AS BIGINT) AS span_tokens,
           CAST((a.shard_id * {cap} + {seq - 1}) // {seq} AS BIGINT)
               AS first_seq_id,
           CAST((least((a.shard_id + 1) * {cap}, t.total_tokens)
                 + {seq - 1}) // {seq}
                - (a.shard_id * {cap} + {seq - 1}) // {seq} AS BIGINT)
               AS n_seqs
    FROM agg a, tot t
    """


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        training_export(spark, sf_correct), _export_sql(), sf_correct
    )


def test_reconciles_exactly(spark, sf_correct):
    """The card's reason to exist: a torn export can't pass it.
    Per shard: split docs telescope to n_docs and split tokens to
    shard_tokens EXACTLY; doc-assigned tokens and capacity spans both
    sum to the SAME packed-corpus total; the sequence layout replays
    from pure integer arithmetic; shard layout agrees with
    export_shards row-for-row on the shared columns."""
    rows = {r["shard_id"]: r for r in training_export(spark, sf_correct).collect()}
    packed = corpus_curate(spark, sf_correct).collect()
    total = sum(r["kept_tokens"] for r in packed)
    assert len(rows) > 1
    for sid, r in rows.items():
        assert r["train_docs"] + r["val_docs"] + r["test_docs"] == r["n_docs"]
        assert (
            r["train_tokens"] + r["val_tokens"] + r["test_tokens"]
            == r["shard_tokens"]
        )
        start = sid * SHARD_TOKENS
        end = min((sid + 1) * SHARD_TOKENS, total)
        assert r["span_tokens"] == end - start
        first = (start + SEQ_LEN - 1) // SEQ_LEN
        assert r["first_seq_id"] == first
        assert r["n_seqs"] == (end + SEQ_LEN - 1) // SEQ_LEN - first
    assert sum(r["shard_tokens"] for r in rows.values()) == total
    assert sum(r["span_tokens"] for r in rows.values()) == total
    assert sum(r["n_seqs"] for r in rows.values()) == (
        total + SEQ_LEN - 1
    ) // SEQ_LEN
    shards = {r["shard_id"]: r for r in export_shards(spark, sf_correct).collect()}
    assert set(shards) == set(rows)
    for sid, s in shards.items():
        assert rows[sid]["n_docs"] == s["n_docs"]
        assert rows[sid]["shard_tokens"] == s["shard_tokens"]
    # every split must actually appear somewhere or the balance leg is
    # vacuous on the fixture
    assert sum(r["val_docs"] + r["test_docs"] for r in rows.values()) > 0
