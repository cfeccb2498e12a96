"""Streaming line-dedup twin vs the oracle-checked batch operator
(staged for round-8 registration; the events_stream twin discipline —
the streaming plan must reproduce the batch result row-for-row)."""

from __future__ import annotations

from bigdata_infra_cs489_spark.operators.linededup import incremental_line_dedup
from bigdata_infra_cs489_spark.streaming.docs_stream import q_stream_line_dedup


def test_stream_matches_batch(spark, sf_correct):
    batch = {
        r["doc_id"]: (r["n_lines"], r["dup_lines"], r["clean_text"])
        for r in incremental_line_dedup(spark, sf_correct).collect()
    }
    stream = {
        r["doc_id"]: (r["n_lines"], r["dup_lines"], r["clean_text"])
        for r in q_stream_line_dedup(spark, sf_correct).collect()
    }
    assert stream == batch
    assert batch, "fixture must contain new-batch docs"


def test_stream_is_streaming_plan(spark, sf_correct):
    """The twin must actually run through the streaming engine (a memory
    sink table exists after the availableNow run), and at least one doc
    must carry dup_lines > 0 so the standing-index probe is exercised."""
    rows = q_stream_line_dedup(spark, sf_correct).collect()
    assert any(r["dup_lines"] > 0 for r in rows)
