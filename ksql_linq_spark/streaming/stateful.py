"""Arbitrary stateful streaming via transformWithStateInPandas.

The engine's tested custom-state path is ``applyInPandasWithState``
(operators/gapfill.py).  This module is the forward path on Spark 4's
transformWithState API — explicit per-key state variables with native
TTL and timers, the exact analog of the reference's RowMonitor state +
timer flushes (src/Runtime/RowMonitor.cs) without its hand-rolled sweep
loop.

ENVIRONMENT GATE: the TWS Python runner needs a working
``google.protobuf``; this container ships a broken protobuf install, so
:func:`tws_available` reports capability and the unit test skips when
absent.  The processor logic itself is plain pandas and identical in a
healthy environment.

Scale notes: state lives in the RocksDB state store (set
``spark.sql.streaming.stateStore.providerClass`` to
RocksDBStateStoreProvider — required by TWS) partitioned by the group
key, so memory is O(active keys / executor) with TTL-driven eviction —
the knob dropDuplicates lacks (its state only ages out with an event-
time watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """True iff the transformWithState Python runner can start here."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


def streaming_first_seen_dedup(
    df: DataFrame, keys: list[str], ttl_ms: int | None = None
) -> DataFrame:
    """Exactly-once-per-key pass-through: the first row of each key is
    emitted, every later arrival is dropped, and the seen-marker expires
    after ``ttl_ms`` (None = keep forever).  Streaming exact-dedup for
    a document pipeline: key on ``fingerprint(text)`` and duplicates
    die in-flight, with TTL bounding state at corpus scale.
    """
    from pyspark.sql.streaming import StatefulProcessor

    out_schema = df.schema

    class FirstSeen(StatefulProcessor):
        def init(self, handle):
            self._seen = handle.getValueState(
                "seen", "hit boolean", ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timer_values):
            if self._seen.exists():
                return
            self._seen.update((True,))
            for pdf in rows:
                if len(pdf):
                    yield pdf.head(1)
                    return

        def close(self):
            pass

    spark = df.sparkSession
    if "rocksdb" not in (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    ).lower():
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        )
    return df.groupBy(*keys).transformWithStateInPandas(
        FirstSeen(), out_schema, "append", "ProcessingTime"
    )
