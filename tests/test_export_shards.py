"""export_shards (fixed-capacity shard manifest of the curated corpus)
vs a DuckDB oracle wrapping the registered corpus_curate twin, plus a
pure-Python replay of the shard arithmetic (oracle single-sourced in
plans/catalog.py since round-10 registration)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.curate import (
    SHARD_TOKENS,
    corpus_curate,
    export_shards,
)

from .oracle import assert_matches_oracle


def _shards_sql() -> str:
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()["export_shards"]


def test_matches_oracle(spark, sf_correct):
    assert_matches_oracle(
        export_shards(spark, sf_correct), _shards_sql(), sf_correct
    )


def test_replays_from_packed_corpus(spark, sf_correct):
    """Shard assignment replays exactly from corpus_curate's running
    totals (shard = start offset DIV capacity); counts and token sums
    conserve to the packed corpus; the fixture must produce more than
    one shard or the manifest demonstrates nothing."""
    packed = corpus_curate(spark, sf_correct).collect()
    want: dict[int, list] = {}
    for r in packed:
        sid = (r["cum_kept_tokens"] - r["kept_tokens"]) // SHARD_TOKENS
        want.setdefault(sid, []).append(r)
    got = {r["shard_id"]: r for r in export_shards(spark, sf_correct).collect()}
    assert set(got) == set(want)
    assert len(got) > 1
    for sid, rows in want.items():
        g = got[sid]
        assert g["n_docs"] == len(rows)
        assert g["shard_tokens"] == sum(r["kept_tokens"] for r in rows)
        assert g["min_doc"] == min(r["doc_id"] for r in rows)
        assert g["max_doc"] == max(r["doc_id"] for r in rows)
    assert sum(g["n_docs"] for g in got.values()) == len(packed)
