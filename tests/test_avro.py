"""Avro wire-format tests — the jar-free twin of the spark-avro path.

The reference's wire format is Schema-Registry Avro
(src/Mapping/MappingRegistry.cs:46-257; src/SerDes/TombstoneSafeSerDes.cs).
The spark-avro jar is absent in this container, so these tests exercise
the pure-python serde (sources/avro_fallback.py) against a CHECKED-IN
binary fixture (tests/fixtures/order_events.avro_frames) — the golden
bytes pin the encoding so a regression in either direction fails loudly.
"""

from __future__ import annotations

import json
import os
import struct

import pytest

from ksql_linq_spark.sources.avro_fallback import (
    avro_decode_pandas,
    decode_record,
    encode_record,
    frame_confluent,
    strip_confluent_header,
)

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
SCHEMA = json.load(open(os.path.join(FIXDIR, "order_events.avsc")))

EXPECTED = [
    {"order_id": 1, "symbol": "ACME", "price": 101.25, "qty": 7,
     "note": "first", "active": True},
    {"order_id": -42, "symbol": "日本", "price": -0.5, "qty": 0,
     "note": None, "active": False},
    {"order_id": 2**40, "symbol": "", "price": 1e300, "qty": -2147483648,
     "note": "ünïcode", "active": True},
]


def _read_frames() -> list[bytes]:
    frames = []
    with open(os.path.join(FIXDIR, "order_events.avro_frames"), "rb") as f:
        while True:
            head = f.read(4)
            if not head:
                return frames
            frames.append(f.read(struct.unpack(">I", head)[0]))


def test_golden_fixture_decodes():
    """Checked-in bytes -> exactly the expected records (format pin)."""
    frames = _read_frames()
    assert len(frames) == 3
    for framed, want in zip(frames, EXPECTED):
        schema_id, body = strip_confluent_header(framed)
        assert schema_id == 7
        assert decode_record(SCHEMA, body) == want


def test_roundtrip_encode_decode():
    """encode -> decode is identity across nulls, negatives, unicode."""
    for rec in EXPECTED:
        assert decode_record(SCHEMA, encode_record(SCHEMA, rec)) == rec


def test_confluent_frame_roundtrip_and_reject():
    body = encode_record(SCHEMA, EXPECTED[0])
    assert strip_confluent_header(frame_confluent(body, 123)) == (123, body)
    with pytest.raises(ValueError):
        strip_confluent_header(b"\x01oops")


def test_spark_mapinpandas_decode(spark):
    """Distributed decode path: BINARY column -> typed columns, corrupt
    frames routed to _corrupt instead of failing the job."""
    frames = _read_frames()
    rows = [(f,) for f in frames] + [(b"\x01not-avro",)]
    df = spark.createDataFrame(rows, "value binary")
    out = avro_decode_pandas(df, "value", json.dumps(SCHEMA)).collect()
    ok = [r for r in out if r["_corrupt"] is None]
    bad = [r for r in out if r["_corrupt"] is not None]
    assert len(ok) == 3 and len(bad) == 1
    got = sorted(
        ({k: r[k] for k in EXPECTED[0]} for r in ok),
        key=lambda d: d["order_id"],
    )
    want = sorted(EXPECTED, key=lambda d: d["order_id"])
    assert got == want
    assert bytes(bad[0]["_corrupt"]) == b"\x01not-avro"


def test_kafka_record_shaping_broker_free(spark):
    """S2 wire contract without a broker: key stringified, value = JSON
    of the full row (value_format='JSON' parity), round-trippable."""
    from ksql_linq_spark.sources import to_kafka_records

    df = spark.createDataFrame(
        [(7, "click", 1.5), (8, "view", -2.0)], "key long, event string, v double"
    )
    recs = {r["key"]: r["value"] for r in to_kafka_records(df).collect()}
    assert set(recs) == {"7", "8"}
    assert json.loads(recs["7"]) == {"key": 7, "event": "click", "v": 1.5}


def test_kafka_source_gated_without_jar(spark):
    """S1: without the spark-sql-kafka connector jar the source returns
    None (gated) instead of raising — callers fall back to the
    file-stream analog."""
    from ksql_linq_spark.sources import kafka_source

    assert kafka_source(spark, "localhost:9092", "events") is None


def test_streaming_avro_decode_with_corrupt_routing(spark, tmp_path):
    """S1 wire-format path end-to-end under Structured Streaming: a
    stream of Confluent-framed Avro binary values decodes via the
    jar-free mapInPandas serde, good rows land typed, corrupt frames
    surface in _corrupt for DLQ routing — the reference's
    TombstoneSafeSerDes + DLQ consume loop shape without a broker."""
    from pyspark.sql import types as T

    from ksql_linq_spark.sources.avro_fallback import (
        avro_decode_pandas,
        encode_record,
        frame_confluent,
    )

    src = str(tmp_path / "frames")
    frames = [
        frame_confluent(encode_record(SCHEMA, r), 7) for r in EXPECTED
    ] + [b"\x02torn-frame"]
    bin_schema = T.StructType([T.StructField("value", T.BinaryType())])
    spark.createDataFrame([(f,) for f in frames], bin_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    stream = spark.readStream.schema(bin_schema).parquet(src)
    decoded = avro_decode_pandas(stream, "value", json.dumps(SCHEMA))
    assert decoded.isStreaming
    q = (
        decoded.writeStream.format("memory")
        .queryName("avro_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM avro_stream").collect()
    finally:
        q.stop()
    ok = [r for r in rows if r["_corrupt"] is None]
    bad = [r for r in rows if r["_corrupt"] is not None]
    assert len(ok) == 3 and len(bad) == 1
    assert sorted(r["order_id"] for r in ok) == sorted(
        r["order_id"] for r in EXPECTED
    )


def test_kafka_options_contract():
    """The jar-gated Kafka source/sink paths never execute in this
    sandbox; these pin the OPTIONS CONTRACT (key names + validation) the
    connector would receive, so the dead path has shape coverage."""
    import pytest

    from ksql_linq_spark.sources import kafka_sink_options, kafka_source_options

    src = kafka_source_options("b1:9092,b2:9092", "orders", "earliest")
    assert src == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "orders",
        "startingOffsets": "earliest",
    }
    # per-partition offset JSON is legal
    kafka_source_options("b:9092", "t", '{"t":{"0":23}}')
    with pytest.raises(ValueError, match="starting_offsets"):
        kafka_source_options("b:9092", "t", "yesterday")
    with pytest.raises(ValueError, match="topic"):
        kafka_source_options("b:9092", "")
    with pytest.raises(ValueError, match="bootstrap_servers"):
        kafka_source_options("", "t")

    snk = kafka_sink_options("b:9092", "out", "/tmp/ckpt")
    assert snk == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "out",
        "checkpointLocation": "/tmp/ckpt",
    }
    with pytest.raises(ValueError, match="checkpointLocation"):
        kafka_sink_options("b:9092", "out", "")
