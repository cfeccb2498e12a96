"""pack_manifest (the attention-mask / lineage manifest of
sequence_pack) vs the registered DuckDB oracle (single-sourced in
plans/catalog.py since round-8 registration) plus tiling invariants."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.textstats import (
    SEQ_LEN,
    pack_manifest,
    sequence_pack,
)

from .oracle import assert_matches_oracle


def test_matches_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    assert_matches_oracle(
        pack_manifest(spark, sf_correct),
        entrymod.oracle_sql()["pack_manifest"],
        sf_correct,
    )


def test_manifest_tiles_every_sequence(spark, sf_correct):
    """Tiling invariants: within each sequence the spans start at 0, are
    contiguous and non-overlapping, sum to seq_tokens; every sequence
    except the last is exactly full; and the manifest agrees with
    sequence_pack's (seq_id, seq_offset) for every document head."""
    rows = sorted(
        pack_manifest(spark, sf_correct).collect(), key=lambda r: r["seq_id"]
    )
    assert rows
    assert [r["seq_id"] for r in rows] == list(range(len(rows)))
    heads = {}
    for r in rows:
        spans = [
            tuple(map(int, p.split(":"))) for p in r["doc_spans"].split(";")
        ]
        assert spans[0][1] == 0, r["seq_id"]
        for (d1, s1, e1), (d2, s2, e2) in zip(spans, spans[1:]):
            assert s2 == e1 + 1, (r["seq_id"], d1, d2)
        assert sum(e - s + 1 for _, s, e in spans) == r["seq_tokens"]
        assert len(spans) == r["n_docs"]
        for d, s, _e in spans:
            # rows iterate in seq order, so setdefault keeps the head
            # piece — where the doc begins
            heads.setdefault(d, (r["seq_id"], s))
    for r in rows[:-1]:
        assert r["seq_tokens"] == SEQ_LEN, r["seq_id"]

    pack = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"])
        for r in sequence_pack(spark, sf_correct).collect()
        if r["n_tokens"] > 0
    }
    assert heads == pack
