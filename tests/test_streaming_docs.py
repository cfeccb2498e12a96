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


def test_stream_matches_batch_on_crafted_newline_corpus(spark, tmp_path):
    """Batch/stream pinning on a crafted corpus (the test_linededup
    newline-banner shape re-cut to the fixture window segmenter): the
    repeated banner, an all-duplicate doc, and an empty doc must come out
    of the streaming twin IDENTICAL to the batch probe, including the
    n_lines = 0 degrade row the stream reaches via explode_outer."""
    banner = "subscribe to our newsletter now please kindly do it today friends"
    filler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    novel = "one two three four five six seven eight nine ten"
    rows = [
        # old corpus (doc_id % 10 != 9): the standing line set
        (1, f"{banner}\n{filler}"),
        (2, banner),
        # new batch (doc_id % 10 == 9)
        (9, f"{banner}\n{novel}"),  # one dup window, one novel
        (19, banner),  # every window already standing
        (29, ""),  # zero-word degrade row
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(d, t, "en", "crafted", len(t)) for d, t in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(sf + "/_tmp")
    import glob
    import shutil

    shutil.move(glob.glob(sf + "/_tmp/part-*.parquet")[0], sf + "/documents.parquet")
    shutil.rmtree(sf + "/_tmp")

    from bigdata_infra_cs489_spark.operators.linededup import (
        incremental_line_dedup,
    )

    batch = {
        r["doc_id"]: (r["n_lines"], r["dup_lines"], r["clean_text"])
        for r in incremental_line_dedup(spark, sf).collect()
    }
    stream = {
        r["doc_id"]: (r["n_lines"], r["dup_lines"], r["clean_text"])
        for r in q_stream_line_dedup(spark, sf).collect()
    }
    assert stream == batch
    assert batch[29] == (0, 0, "")
    assert batch[19][1] == batch[19][0]  # fully duplicated vs standing
    assert batch[9][1] >= 1 and novel.split()[0] in batch[9][2]


def test_stream_token_drift_matches_batch_and_oracle(spark, sf_correct):
    """The streaming drift monitor's terminal card equals the batch
    operator row-for-row (the twin contract) AND hash-checks against
    the batch card's registered DuckDB oracle — the
    stream_line_dedup/incremental shared-oracle discipline (registered
    round 10, sharing token_drift_report's oracle verbatim)."""
    import __spark_entry__ as entrymod

    from bigdata_infra_cs489_spark.operators.dsir import token_drift_report
    from bigdata_infra_cs489_spark.streaming.docs_stream import (
        q_stream_token_drift,
    )

    from .oracle import assert_matches_oracle

    batch = token_drift_report(spark, sf_correct).collect()
    stream_df = q_stream_token_drift(spark, sf_correct)
    stream = stream_df.collect()
    assert [tuple(r) for r in stream] == [tuple(r) for r in batch]
    assert_matches_oracle(
        stream_df,
        entrymod.oracle_sql()["token_drift_report"],
        sf_correct,
    )
