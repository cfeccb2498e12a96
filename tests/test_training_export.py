"""training_export (the one-card training-run export: shard layout x
split balance x sequence layout over the curated corpus) vs the
REGISTERED DuckDB oracle (single-sourced from catalog.py — a round-11
advisory found an inline copy here silently diverging from the
registered spine), plus exact reconciliation invariants, a pure-Python
replay, and crafted-frame pins for the spine zero-fill paths."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.curate import (
    SHARD_TOKENS,
    corpus_curate,
    export_shards,
    training_export,
    training_export_core,
)
from bigdata_infra_cs489_spark.operators.textstats import SEQ_LEN

from .oracle import assert_matches_oracle


def _export_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["training_export"]


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
    # export_shards carries no spine, so its rows are a SUBSET of the
    # card's; any card-only row must be a spine zero-fill
    assert set(shards) <= set(rows)
    for sid, s in shards.items():
        assert rows[sid]["n_docs"] == s["n_docs"]
        assert rows[sid]["shard_tokens"] == s["shard_tokens"]
    for sid in set(rows) - set(shards):
        assert rows[sid]["n_docs"] == 0 and rows[sid]["shard_tokens"] == 0
    # every split must actually appear somewhere or the balance leg is
    # vacuous on the fixture
    assert sum(r["val_docs"] + r["test_docs"] for r in rows.values()) > 0


def _packed_frame(spark, docs):
    """(doc_id, split, kept_tokens) triples -> a packed-corpus frame in
    the given order with exact running totals, the core's input shape."""
    rows, cum = [], 0
    for doc_id, split, kept in docs:
        cum += kept
        rows.append((doc_id, split, kept, cum))
    return spark.createDataFrame(
        rows, "doc_id bigint, split string, kept_tokens bigint,"
        " cum_kept_tokens bigint"
    )


def _replay(docs, cap, seq):
    """Pure-Python training_export replay: shard assignment, split
    balance, spine zero-fill, capacity spans, sequence layout."""
    total, cum, agg = sum(k for _, _, k in docs), 0, {}
    for _doc_id, split, kept in docs:
        sid = cum // cap
        cum += kept
        a = agg.setdefault(sid, dict.fromkeys(
            ("n_docs", "shard_tokens", "train_docs", "val_docs", "test_docs",
             "train_tokens", "val_tokens", "test_tokens"), 0))
        a["n_docs"] += 1
        a["shard_tokens"] += kept
        a[f"{split}_docs"] += 1
        a[f"{split}_tokens"] += kept
    n_shards = (total + cap - 1) // cap
    last = max(n_shards - 1, max(agg, default=-1))
    out = {}
    for sid in range(last + 1):
        a = agg.get(sid) or dict.fromkeys(
            ("n_docs", "shard_tokens", "train_docs", "val_docs", "test_docs",
             "train_tokens", "val_tokens", "test_tokens"), 0)
        start, end = sid * cap, min((sid + 1) * cap, total)
        out[sid] = dict(
            a,
            span_tokens=end - start,
            first_seq_id=(start + seq - 1) // seq,
            n_seqs=(end + seq - 1) // seq - (start + seq - 1) // seq,
        )
    return out


def _core_rows(spark, docs, cap, seq):
    got = training_export_core(
        _packed_frame(spark, docs), shard_tokens=cap, seq_len=seq
    ).collect()
    return {r["shard_id"]: {k: r[k] for k in r.asDict() if k != "shard_id"}
            for r in got}


def test_core_zero_fills_spanned_shards(spark):
    """Round-11 advisory: a doc whose kept_tokens exceed the shard
    capacity spans shards no doc starts in — the card must emit those
    as explicit zero-doc rows (and Σ span_tokens must still telescope
    to the exact total), on the Spark plan and the replay alike."""
    docs = [(1, "train", 500), (2, "val", 5500), (3, "test", 700)]
    cap, seq = 2000, 300
    rows = _core_rows(spark, docs, cap, seq)
    assert rows == _replay(docs, cap, seq)
    assert set(rows) == {0, 1, 2, 3}  # total 6700 -> 4 shards
    assert rows[1]["n_docs"] == 0 and rows[2]["n_docs"] == 0
    assert rows[1]["span_tokens"] == cap and rows[2]["span_tokens"] == cap
    assert sum(r["span_tokens"] for r in rows.values()) == 6700
    assert sum(r["shard_tokens"] for r in rows.values()) == 6700


def test_core_keeps_trailing_zero_token_doc(spark):
    """Round-12 advisory: a zero-kept-token doc whose span starts
    exactly at the total (total an exact multiple of the capacity) is
    assigned shard_id = n_shards; the spine must extend to keep it as
    an explicit zero-span trailing shard instead of silently dropping
    the doc from the manifest."""
    docs = [(1, "train", 2000), (2, "val", 2000), (3, "test", 0)]
    cap, seq = 2000, 300
    rows = _core_rows(spark, docs, cap, seq)
    assert rows == _replay(docs, cap, seq)
    assert set(rows) == {0, 1, 2}
    assert rows[2] == dict(
        n_docs=1, shard_tokens=0, train_docs=0, val_docs=0, test_docs=1,
        train_tokens=0, val_tokens=0, test_tokens=0,
        span_tokens=0, first_seq_id=(4000 + seq - 1) // seq, n_seqs=0,
    )
    assert sum(r["n_docs"] for r in rows.values()) == 3
    assert sum(r["span_tokens"] for r in rows.values()) == 4000


def test_core_empty_corpus_is_empty_card(spark):
    assert _core_rows(spark, [], 2000, 300) == {}
