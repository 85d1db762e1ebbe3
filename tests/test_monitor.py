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


# ---------------------------------------------------------------- incidents
# Reference: src/Incidents/IncidentBus.cs:11-19, src/Events/RuntimeEventBus.cs,
# src/Window/WindowAggregatorMetrics.cs (late-drop counters).


def test_incident_bus_isolated_dispatch_and_ring():
    from ksql_linq_spark.streaming.incidents import Incident, IncidentBus

    bus = IncidentBus(keep=2)
    seen = []
    bus.subscribe(lambda i: (_ for _ in ()).throw(RuntimeError("boom")))
    bus.subscribe(seen.append)
    for k in ("a", "b", "c"):
        bus.publish(Incident(kind=k, query_id="q"))
    # the throwing handler never blocked the second one
    assert [i.kind for i in seen] == ["a", "b", "c"]
    # ring keeps only the last `keep`
    assert [i.kind for i in bus.recent()] == ["b", "c"]
    assert [i.kind for i in bus.recent("c")] == ["c"]


def test_incident_listener_restart_and_late_drop_from_progress():
    from ksql_linq_spark.streaming.incidents import IncidentBus, IncidentListener

    bus = IncidentBus()
    lis = IncidentListener(bus)
    lis.on_started("qid1", "run1", "cascade_1m")
    assert bus.recent("restart") == []          # first start is not a restart
    lis.on_started("qid1", "run2", "cascade_1m")
    assert len(bus.recent("restart")) == 1      # same id, new run = recovery

    prog = {
        "id": "qid1", "name": "cascade_1m", "batchId": 4,
        "eventTime": {"watermark": "2024-01-01T00:10:00.000Z"},
        "stateOperators": [
            {"operatorName": "stateStoreSave", "numRowsDroppedByWatermark": 3}
        ],
    }
    lis.on_progress(prog)
    lis.on_progress(prog)                       # cumulative counter unchanged
    drops = bus.recent("late_drop")
    assert len(drops) == 1                      # delta-based, not cumulative
    assert drops[0].details["n_rows"] == 3
    assert drops[0].batch_id == 4
    lis.on_progress({**prog, "batchId": 5,
                     "stateOperators": [{"operatorName": "stateStoreSave",
                                         "numRowsDroppedByWatermark": 5}]})
    assert len(bus.recent("late_drop")) == 2
    assert bus.recent("late_drop")[-1].details["n_rows"] == 2

    lis.on_terminated("qid1", exception=None)
    lis.on_terminated("qid1", exception="java.io.IOException: gone")
    assert len(bus.recent("terminated")) == 1
    assert bus.recent("failed")[0].details["exception"].startswith("java.io")


def test_incident_listener_live_late_drop(spark):
    """End-to-end: an induced late row (behind the watermark) produces
    exactly one late_drop incident through the real
    StreamingQueryListener wiring."""
    import datetime as dt
    import shutil
    import tempfile
    import time as _time

    from ksql_linq_spark.streaming.incidents import attach_incident_listener

    core, shim = attach_incident_listener(spark)
    tmp = tempfile.mkdtemp()
    schema = "k long, ts timestamp"
    b1 = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 0, 1)),
         (1, dt.datetime(2024, 1, 1, 0, 30, 0))], schema
    )
    b1.coalesce(1).write.mode("append").parquet(f"{tmp}/in")
    stream = spark.readStream.schema(b1.schema).parquet(f"{tmp}/in")
    agg = (
        stream.withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "1 minute"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory").queryName("t_inc")
        .outputMode("update")
        .option("checkpointLocation", f"{tmp}/ck")
        .start()
    )
    try:
        q.processAllAvailable()      # batch 1 sets watermark ~00:29:50
        late = spark.createDataFrame(
            [(2, dt.datetime(2024, 1, 1, 0, 0, 5))], schema  # far behind
        )
        late.coalesce(1).write.mode("append").parquet(f"{tmp}/in")
        q.processAllAvailable()
        deadline = _time.time() + 20
        while _time.time() < deadline and not core.bus.recent("late_drop"):
            _time.sleep(0.2)         # listener thread is async
    finally:
        q.stop()
        spark.streams.removeListener(shim)
        shutil.rmtree(tmp, ignore_errors=True)
    drops = core.bus.recent("late_drop")
    assert len(drops) == 1, drops
    assert drops[0].details["n_rows"] == 1
