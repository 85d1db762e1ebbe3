"""Benchmark runner: all registered queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": "total_sec", "value": N, "unit": "sec",
"queries": {name: sec}, "sf": 0.1}.  Each query executes its full plan
via the noop sink (no driver-side collect cost).
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

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            run_query(fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # record failures as -1, don't kill the run
            print(f"# bench error {name}: {e}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
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
