"""incremental_training_export (append-only delta shards of the
training-run export) vs an inline DuckDB oracle composed from the
REGISTERED corpus_curate / incremental_curate twins, plus the exact
append-reconciliation invariants (registered in the round-13
rotation; oracle single-sourced from the catalog)."""

from __future__ import annotations

import pyspark.sql.functions as F

from bigdata_infra_cs489_spark.operators.curate import (
    SHARD_TOKENS,
    corpus_curate,
    incremental_curate,
    incremental_training_export,
    training_export_core,
)
from bigdata_infra_cs489_spark.operators.dedup import NEW_BATCH_MOD
from bigdata_infra_cs489_spark.operators.distsort import with_running_totals
from .oracle import assert_matches_oracle


def _delta_sql() -> str:
    """Registered in the round-13 rotation — single-sourced from the
    catalog so this test and the driver check the identical twin."""
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["incremental_training_export"]


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        incremental_training_export(spark, sf_correct), _delta_sql(), sf_correct
    )


def _build_streams(spark, sf_dir):
    """(old_stream, append_stream, t_old, kept_new_rows) rebuilt from the
    public operator pieces, mirroring incremental_training_export."""
    is_old = (F.col("doc_id") % NEW_BATCH_MOD) != (NEW_BATCH_MOD - 1)
    old_packed = with_running_totals(
        corpus_curate(spark, sf_dir)
        .where(is_old)
        .select("doc_id", "split", "kept_tokens", "quality_score"),
        [F.desc("quality_score"), F.asc("doc_id")],
        {"cum_kept_tokens": "kept_tokens"},
    )
    kept_new = (
        incremental_curate(spark, sf_dir)
        .where(F.col("verdict") == "kept")
        .select(
            "doc_id",
            "split",
            (F.col("n_tokens") - F.col("dup_old_tokens")).alias("kept_tokens"),
            "quality_score",
        )
    )
    old_rows = old_packed.collect()
    new_rows = sorted(
        kept_new.collect(), key=lambda r: (-r.quality_score, r.doc_id)
    )
    t_old = sum(r.kept_tokens for r in old_rows)
    return old_packed, old_rows, new_rows, t_old


def test_append_reconciliation(spark, sf_correct):
    """The card's contract: (a) the delta equals the full append-stream
    export's tail row-for-row; (b) every shard strictly before the
    boundary is identical to the STANDING export (appending never
    rewrites published shards); (c) new_docs/new_tokens telescope to the
    increment exactly."""
    old_packed, old_rows, new_rows, t_old = _build_streams(spark, sf_correct)
    delta = {r.shard_id: r for r in
             incremental_training_export(spark, sf_correct).collect()}
    boundary = t_old // SHARD_TOKENS
    assert delta and min(delta) == boundary

    # (c) increment telescopes exactly, and the increment is non-trivial
    assert sum(r.new_docs for r in delta.values()) == len(new_rows) > 0
    assert (
        sum(r.new_tokens for r in delta.values())
        == sum(r.kept_tokens for r in new_rows)
    )

    # (a) full append-stream export tail == delta (shared columns)
    cum = t_old
    stream_rows = [(r.doc_id, r.split, r.kept_tokens, r.cum_kept_tokens)
                   for r in old_rows]
    for r in new_rows:
        cum += r.kept_tokens
        stream_rows.append((r.doc_id, r.split, r.kept_tokens, cum))
    stream = spark.createDataFrame(
        stream_rows,
        "doc_id bigint, split string, kept_tokens bigint,"
        " cum_kept_tokens bigint",
    )
    full = {r.shard_id: r for r in training_export_core(stream).collect()}
    for sid, d in delta.items():
        f = full[sid]
        for c in ("n_docs", "shard_tokens", "span_tokens",
                  "first_seq_id", "n_seqs"):
            assert d[c] == f[c], (sid, c)

    # (b) standing prefix untouched: the standing-only export agrees with
    # the full export on every shard strictly before the boundary
    standing = {r.shard_id: r for r in
                training_export_core(old_packed).collect()}
    for sid in range(boundary):
        for c in ("n_docs", "shard_tokens", "first_seq_id"):
            assert standing[sid][c] == full[sid][c], (sid, c)
    # the boundary shard gains exactly the new docs that start in it
    b = delta[boundary]
    if boundary in standing:
        assert b.n_docs == standing[boundary].n_docs + b.new_docs
        assert (
            b.shard_tokens == standing[boundary].shard_tokens + b.new_tokens
        )


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:
    _doc_lists = st.lists(
        st.tuples(
            st.sampled_from(["train", "val", "test"]),
            st.integers(min_value=0, max_value=7000),
        ),
        min_size=0,
        max_size=12,
    )

    @settings(max_examples=10, deadline=None)
    @given(docs=_doc_lists, cap=st.sampled_from([1000, 2000, 2048]))
    def test_export_core_matches_replay_property(spark, docs, cap):
        """training_export_core == the pure-Python replay on arbitrary
        packed streams: adversarial kept_tokens mixes (zeros, docs
        bigger than the capacity, exact-multiple totals) hit every
        spine path the crafted unit cases pin individually."""
        from .test_training_export import _core_rows, _replay

        rows = [(i + 1, split, kept) for i, (split, kept) in enumerate(docs)]
        assert _core_rows(spark, rows, cap, 300) == _replay(rows, cap, 300)
