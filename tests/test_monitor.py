"""Lag/heartbeat monitor (SURVEY §2.8 C8) — unit + live-query tests."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from ksql_linq_spark.sources import read_stream_from_table
from ksql_linq_spark.streaming.monitor import (
    LagSnapshot,
    QueryMonitor,
    heartbeat,
    lag_snapshot,
)
from ksql_linq_spark.streaming.windows import EmitMode, start_memory_sink, windowed_aggregate


def _kafka_progress(end, latest):
    return {
        "batchId": 7,
        "numInputRows": 42,
        "sources": [
            {"endOffset": json.dumps(end), "latestOffset": json.dumps(latest)}
        ],
    }


def test_lag_snapshot_kafka_offsets():
    snap = lag_snapshot(
        _kafka_progress(
            end={"t": {"0": 100, "1": 50}},
            latest={"t": {"0": 130, "1": 55}},
        )
    )
    assert snap == LagSnapshot(sum_lag=35, max_lag=30)


def test_lag_snapshot_clamps_and_handles_missing():
    # committed ahead of head (stale head probe) clamps to 0, like
    # LagMonitor.cs Math.Max(0, high - comm); unknown partitions count fully
    snap = lag_snapshot(
        _kafka_progress(end={"t": {"0": 200}}, latest={"t": {"0": 150, "1": 10}})
    )
    assert snap == LagSnapshot(sum_lag=10, max_lag=10)
    assert lag_snapshot(None) == LagSnapshot(0, 0)
    assert lag_snapshot({"sources": [{"endOffset": "notjson", "latestOffset": None}]}) == LagSnapshot(0, 0)


def test_heartbeat_fields():
    hb = heartbeat(
        {
            "batchId": 3,
            "numInputRows": 10,
            "inputRowsPerSecond": 5.0,
            "eventTime": {"watermark": "2024-01-01T00:00:00.000Z"},
            "stateOperators": [{"numRowsTotal": 8, "numRowsDroppedByWatermark": 2}],
            "durationMs": {"triggerExecution": 120},
        }
    )
    assert hb["alive"] and hb["batch_id"] == 3 and hb["state_rows"] == 8
    assert hb["rows_dropped_by_watermark"] == 2 and hb["trigger_ms"] == 120
    assert heartbeat(None) == {"alive": False}


def test_query_monitor_on_live_query(spark, sf_dir):
    stream = read_stream_from_table(spark, sf_dir, "events")
    agg, mode = windowed_aggregate(
        stream,
        keys=["event_type"],
        ts_col="ts",
        aggs=[F.count(F.lit(1)).alias("n")],
        size="1 hour",
        grace="1 seconds",
        emit=EmitMode.FINAL,
    )
    q = start_memory_sink(agg, "t_monitor", mode)
    mon = QueryMonitor(q)
    try:
        q.processAllAvailable()
        hb = mon.heartbeat()
        assert hb["alive"] and hb["is_active"]
        assert hb["num_input_rows"] >= 0 and hb["batch_id"] is not None
        # stateful aggregate reports state rows; file source reports no broker
        # head, so lag is 0 by definition
        assert mon.snapshot() == LagSnapshot(0, 0)
        assert mon.flush_reason(mode) == "grace"
    finally:
        q.stop()
