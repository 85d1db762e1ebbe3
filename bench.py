"""Benchmark runner: all registered queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": "total_sec", "value": N, "unit": "sec",
"queries": {name: sec}, "sf": 0.1}.  Each query executes its full plan
via the noop sink (no driver-side collect cost).

TWO-PASS: every query runs twice and the reported time is the SECOND
run (steady state).  Round-2 showed single-pass numbers are poisoned by
execution-order artifacts — JIT warm-up / first-touch page faults landed
on whichever trivial query ran first after a heavy one (json_functions
"7.6 s" on a 0-shuffle plan) — making real regressions
indistinguishable from position noise.  The first-pass total is kept in
``cold_total_sec`` so the warm-up cost stays visible.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ksql_linq_spark.session import build_session


def run_query(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = build_session("bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    # warm the JVM, parquet footers, and codegen/agg paths so the first
    # timed query is not charged the session's one-time startup cost
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    entry_mod.entry(spark).write.mode("overwrite").format("noop").save()

    def one_pass() -> dict[str, float]:
        timings: dict[str, float] = {}
        for name, fn in qs.items():
            t0 = time.perf_counter()
            try:
                run_query(fn(spark, sf_dir))
                timings[name] = round(time.perf_counter() - t0, 3)
            except Exception as e:  # record failures as -1, don't kill the run
                print(f"# bench error {name}: {e}", file=sys.stderr)
                timings[name] = -1.0
        return timings

    cold = one_pass()   # pass 1: warm-up (JIT, page cache, codegen cache)
    warm = one_pass()   # pass 2: the reported steady-state numbers

    total = round(sum(t for t in warm.values() if t >= 0), 3)
    cold_total = round(sum(t for t in cold.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_sec",
                "value": total,
                "unit": "sec",
                "queries": warm,
                "sf": sf,
                "passes": 2,
                "cold_total_sec": cold_total,
            }
        )
    )
    # the JSON line above MUST be the last stdout bytes (the harness
    # parses the tail); skip JVM/py4j shutdown hooks, which can emit
    # after it
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
