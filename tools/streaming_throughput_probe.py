"""Streaming cascade throughput ceiling probe (r7, VERDICT r6 item 8).

The cascade soak proves CORRECTNESS under kill/restart; this probe
produces the first CAPACITY number: the maximum sustained input rate
(rows/s) the 3-tier streaming cascade (1 s hub -> 1m -> 5m) absorbs on
local[32], and the state size per tier at that rate.

Method: the built-in ``rate`` source generates ticks at a fixed
rows-per-second (mapped to the cascade's tick schema with 5 keys and a
2-dp value — pure Column ops, no Python boundary).  Each leg runs one
rate for ``LEG_SECONDS``; a leg is SUSTAINED when, over its second
half, the hub tier's mean processedRowsPerSecond >= 97% of the input
rate and batch durations stay under the trigger interval (no backlog
growth).  Rates double until a leg fails; the ceiling is the last
sustained rate.  State rows per tier come from each query's
``lastProgress.stateOperators``.

v2 (r8, VERDICT r7 item 5): the r7 ladder ran with 5 distinct keys —
trivial state cardinality, so the 800k rows/s number proved RATE, not
STATE pressure.  ``--key-ladder`` holds the rate fixed and fans the key
domain out (100k..1M synthetic symbols): state rows per tier scale with
keys x open-windows, and each leg records per-tier state rows AND
stateOperators memoryUsedBytes (the HDFSBackedStateStore resident size
— this container has no RocksDB provider), so the artifact shows the
knee and WHICH resource binds (batch duration → CPU; memory growth →
state store).

Run on an idle box (concurrent load manufactures false back-pressure).
Usage: python tools/streaming_throughput_probe.py [start_rate]
       (default 100_000 rows/s, doubling)
       python tools/streaming_throughput_probe.py --key-ladder \
           [rate] [n_keys ...]
       (default rate 400_000; keys 1k 10k 100k 500k 1M)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksql_linq_spark.session import build_session

LEG_SECONDS = 75
TRIGGER_SECONDS = 5
MAX_LEGS = 6


def run_leg(spark, rate: int, n_keys: int = 5) -> dict:
    from pyspark.sql import functions as F

    from ksql_linq_spark.operators.cascade import (
        CascadePlan,
        start_streaming_cascade,
    )

    tmp = tempfile.mkdtemp(prefix=f"thr_{rate}_{n_keys}_")
    ticks = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rate))
        .option("numPartitions", "8")
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            F.concat(F.lit("k"), (F.col("value") % n_keys).cast("string")).alias(
                "event_type"
            ),
            ((F.col("value") % 10000).cast("double") / 100).alias("value"),
        )
    )
    plan = CascadePlan(
        base_name="thr", keys=["event_type"], ts_col="ts",
        price_col="value", timeframes=["1m", "5m"],
    )
    queries = start_streaming_cascade(
        plan, ticks, sink_dir=f"{tmp}/sink", checkpoint_dir=f"{tmp}/ckpt",
        trigger_seconds=TRIGGER_SECONDS,
    )
    hub = queries[0]
    t0 = time.time()
    samples = []  # (elapsed, inputRps, processedRps, batchDurMs)
    state_rows: dict[str, int] = {}
    state_bytes: dict[str, int] = {}
    try:
        while time.time() - t0 < LEG_SECONDS:
            time.sleep(TRIGGER_SECONDS)
            p = hub.lastProgress
            if p and p["numInputRows"] > 0:
                samples.append(
                    (
                        time.time() - t0,
                        p["inputRowsPerSecond"],
                        p["processedRowsPerSecond"],
                        p["batchDuration"],
                    )
                )
        for q in queries:
            lp = q.lastProgress
            if lp:
                state_rows[q.name or q.id] = sum(
                    so["numRowsTotal"] for so in lp.get("stateOperators", [])
                )
                state_bytes[q.name or q.id] = sum(
                    so.get("memoryUsedBytes", 0)
                    for so in lp.get("stateOperators", [])
                )
    finally:
        for q in queries:
            q.stop()
        shutil.rmtree(tmp, ignore_errors=True)

    half = [s for s in samples if s[0] > LEG_SECONDS / 2]
    if not half:
        return {"rate": rate, "n_keys": n_keys, "sustained": False,
                "reason": "no steady samples"}
    mean_proc = sum(s[2] for s in half) / len(half)
    max_batch_ms = max(s[3] for s in half)
    cpu_bound = max_batch_ms > TRIGGER_SECONDS * 1000 * 1.5
    sustained = mean_proc >= 0.97 * rate and not cpu_bound
    return {
        "rate": rate,
        "n_keys": n_keys,
        "sustained": bool(sustained),
        "steady_processed_rps": round(mean_proc),
        "max_batch_ms": max_batch_ms,
        # which resource binds when a leg fails: batch overrun = CPU;
        # sustained-but-growing memory = state store
        "binding": ("batch_duration(cpu)" if cpu_bound
                    else ("none" if sustained else "throughput")),
        "state_rows_by_tier": state_rows,
        "state_bytes_by_tier": state_bytes,
        "samples": len(half),
    }


def main() -> int:
    spark = build_session("stream-throughput")
    spark.sparkContext.setLogLevel("ERROR")

    if len(sys.argv) > 1 and sys.argv[1] == "--key-ladder":
        rate = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
        key_steps = ([int(x) for x in sys.argv[3:]]
                     or [1_000, 10_000, 100_000, 500_000, 1_000_000])
        legs = []
        knee = None
        for nk in key_steps:
            res = run_leg(spark, rate, n_keys=nk)
            legs.append(res)
            print(json.dumps(res))
            if not res["sustained"] and knee is None:
                knee = nk
        out = {
            "mode": "key_ladder",
            "trigger_seconds": TRIGGER_SECONDS,
            "leg_seconds": LEG_SECONDS,
            "rate_rows_per_sec": rate,
            "first_unsustained_n_keys": knee,
            "legs": legs,
        }
        with open("STREAM_THROUGHPUT_KEYS.json", "w") as f:
            json.dump(out, f, indent=1)
        print(f"key-ladder knee: {knee} -> STREAM_THROUGHPUT_KEYS.json")
        return 0

    rate = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    legs = []
    ceiling = None
    for _ in range(MAX_LEGS):
        res = run_leg(spark, rate)
        legs.append(res)
        print(json.dumps(res))
        if not res["sustained"]:
            break
        ceiling = rate
        rate *= 2
    out = {"trigger_seconds": TRIGGER_SECONDS, "leg_seconds": LEG_SECONDS,
           "ceiling_rows_per_sec": ceiling, "legs": legs}
    with open("STREAM_THROUGHPUT.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"ceiling: {ceiling} rows/s -> STREAM_THROUGHPUT.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
