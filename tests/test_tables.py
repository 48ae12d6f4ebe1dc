"""Events-loader dtype dispatch: the fixture ships timestamp[us], but the
loader must also survive a TIMESTAMP(NANOS)-written file surfacing as
INT64 under nanosAsLong (the round-1 regression) and reject anything
else loudly."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pot_spark.tables import load


def test_events_ts_is_timestamp(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    assert str(ev.schema["ts"].dataType) == "TimestampType()"
    assert ev.filter("ts IS NULL").count() == 0


def test_events_loader_handles_long_nanos(spark, tmp_path):
    # simulate the nanos-as-long fallback: write ts as raw int64 nanos
    d = str(tmp_path / "sfnanos")
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(
                [1704067200_000_000_000, 1704067260_500_000_000], pa.int64()
            ),
            "user_id": pa.array([1, 1], pa.int64()),
            "event_type": pa.array(["a", "b"]),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    import os

    os.makedirs(d)
    pq.write_table(tbl, f"{d}/events.parquet")
    ev = load(spark, d, "events")
    rows = {r.event_id: str(r.ts) for r in ev.collect()}
    assert rows[1] == "2024-01-01 00:00:00"
    assert rows[2] == "2024-01-01 00:01:00.500000"


def test_events_loader_rejects_unexpected_dtype(spark, tmp_path):
    d = str(tmp_path / "sfbad")
    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array(["not-a-time"]),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["a"]),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"]),
        }
    )
    import os

    os.makedirs(d)
    pq.write_table(tbl, f"{d}/events.parquet")
    with pytest.raises(TypeError, match="unexpected events.ts dtype"):
        load(spark, d, "events")
