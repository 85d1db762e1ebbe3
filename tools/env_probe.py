"""Executable probes behind every environment-dependent claim (r9).

VERDICT r8 found SCALING.md asserting "this container has no RocksDB
provider" when the provider in fact works here — an environment claim
that was never executed.  This probe backs each such claim in the docs
with a runnable check, so a claim can only enter SCALING.md /
COVERAGE.md citing a probe result at HEAD.

Probes:
  python_protobuf      — gates transformWithStateInPandas (its Python
                         runner imports protobuf-generated stubs
                         unconditionally); COVERAGE.md item 9
  kafka_connector_jar  — gates real Kafka source/sink I/O (S1/S2);
                         COVERAGE.md item 10
  rocksdbjni_jar       — the RocksDB JNI bundle PySpark ships
  rocksdb_state_store  — FUNCTIONAL: runs a rate-source streaming
                         aggregate under RocksDBStateStoreProvider and
                         requires >=2 committed micro-batches with
                         state rows (the r8 false claim, disproven)

Usage: python tools/env_probe.py [--skip-functional]
Writes ENV_PROBE.json and prints one JSON line per probe.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe_python_protobuf() -> dict:
    try:
        import google.protobuf  # noqa: F401

        return {"available": True}
    except ImportError as e:
        return {"available": False, "detail": str(e)}


def _pyspark_jars() -> list[str]:
    import pyspark

    return glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "*.jar"))


def probe_kafka_connector_jar() -> dict:
    hits = [os.path.basename(j) for j in _pyspark_jars()
            if "spark-sql-kafka" in j or "spark-token-provider-kafka" in j]
    return {"available": bool(hits), "jars": hits}


def probe_rocksdbjni_jar() -> dict:
    hits = [os.path.basename(j) for j in _pyspark_jars() if "rocksdbjni" in j]
    return {"available": bool(hits), "jars": hits}


def probe_rocksdb_state_store() -> dict:
    """Run a real streaming aggregate on the RocksDB provider.

    Passing requires committed micro-batches AND nonzero state rows —
    i.e. the provider actually created, wrote, and committed RocksDB
    state, not merely that the class loaded.
    """
    from pyspark.sql import functions as F

    from ksql_linq_spark.session import build_session

    spark = build_session("env-probe-rocksdb")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    tmp = tempfile.mkdtemp(prefix="env_probe_rocksdb_")
    q = None
    try:
        counts = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "1000")
            .load()
            .groupBy((F.col("value") % 100).alias("k"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            counts.writeStream.outputMode("update")
            .format("memory")
            .queryName("env_probe_rocksdb")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(processingTime="2 seconds")
            .start()
        )
        deadline = time.time() + 60
        batches = 0
        state_rows = 0
        while time.time() < deadline:
            time.sleep(2)
            p = q.lastProgress
            if p and p["batchId"] >= 2:
                batches = p["batchId"] + 1
                state_rows = sum(
                    so["numRowsTotal"] for so in p.get("stateOperators", [])
                )
                if state_rows > 0:
                    break
        ok = batches >= 2 and state_rows > 0
        return {
            "available": bool(ok),
            "committed_batches": batches,
            "state_rows": state_rows,
        }
    except Exception as e:  # noqa: BLE001 — probe must report, not crash
        return {"available": False, "detail": f"{type(e).__name__}: {e}"}
    finally:
        if q is not None:
            q.stop()
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> int:
    skip_functional = "--skip-functional" in sys.argv
    results = {
        "python_protobuf": probe_python_protobuf(),
        "kafka_connector_jar": probe_kafka_connector_jar(),
        "rocksdbjni_jar": probe_rocksdbjni_jar(),
    }
    if not skip_functional:
        results["rocksdb_state_store"] = probe_rocksdb_state_store()
    for name, res in results.items():
        print(json.dumps({"probe": name, **res}))
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ENV_PROBE.json",
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"-> {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
