"""events_anomaly_days (per-type daily z-score anomaly scan) vs an
inline DuckDB oracle AND a NumPy replay plus a crafted-spike corpus
check (single-sourced in plans/catalog.py since round-9 registration)."""

from __future__ import annotations

import math

from bigdata_infra_cs489_spark.operators.analytics import (
    ANOMALY_Z,
    events_anomaly_days,
)

from .oracle import assert_matches_oracle

def test_matches_oracle(spark, sf_correct):
    import __spark_entry__ as entrymod

    assert_matches_oracle(
        events_anomaly_days(spark, sf_correct),
        entrymod.oracle_sql()["events_anomaly_days"],
        sf_correct,
    )


def test_zscore_replay_and_signal(spark, sf_correct):
    """Per-type z-scores replay the sample-variance formula from the
    collected daily counts; every type's z-scores are mean~0; the scan
    must run over real multi-day signal."""
    rows = events_anomaly_days(spark, sf_correct).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert by_type
    for t, rs in by_type.items():
        ns = [r["n_events"] for r in rs]
        d = len(ns)
        assert d > 1, t
        mean = sum(ns) / d
        var = (sum(n * n for n in ns) - sum(ns) ** 2 / d) / (d - 1)
        for r in rs:
            want = (r["n_events"] - mean) / math.sqrt(var) if var > 0 else 0.0
            want = math.copysign(math.floor(abs(want) * 1e6 + 0.5), want) / 1e6
            assert abs(r["z_score"] - want) < 2e-6, (t, r["day"])
            assert r["is_anomaly"] == (abs(r["z_score"]) >= ANOMALY_Z)


def test_crafted_spike_is_flagged(spark):
    """A 10x single-day spike against a flat baseline must flag exactly
    that day."""
    import datetime as dt

    rows = []
    base = dt.datetime(2024, 1, 1)
    eid = 0
    for day in range(10):
        n = 100 if day == 5 else 10
        for i in range(n):
            rows.append(
                (eid, base + dt.timedelta(days=day, seconds=i), 1, "click", 1.0)
            )
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        ev.coalesce(1).write.parquet(tmp + "/_t")
        import glob
        import shutil

        shutil.move(glob.glob(tmp + "/_t/part-*.parquet")[0], tmp + "/events.parquet")
        out = {
            r["day"]: r for r in events_anomaly_days(spark, tmp).collect()
        }
        flagged = [d for d, r in out.items() if r["is_anomaly"]]
        assert flagged == ["2024-01-06"]
        assert out["2024-01-06"]["z_score"] > ANOMALY_Z
