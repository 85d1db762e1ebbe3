"""Capture .explain("formatted") for named queries into text files.

The optimization-round evidence trail: for each query touched this
round, `plans/r13/<query>_before.txt` is captured in a worktree at the
pre-round commit and `..._after.txt` at HEAD, so plan-shape claims in
OPTIMIZATION_r13.md (Exchange counts, join strategies, PushedFilters)
are checkable without running Spark.

Usage: python tools/capture_plans.py OUT_DIR SUFFIX [--sf DIR] query ...
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ksql_linq_spark.session import build_session


def main() -> None:
    args = sys.argv[1:]
    out_dir, suffix = args[0], args[1]
    rest = args[2:]
    sf_dir = "/root/testdata/sf0.1"
    names: list[str] = []
    i = 0
    while i < len(rest):
        if rest[i] == "--sf":
            sf_dir = rest[i + 1]
            i += 2
        else:
            names.append(rest[i])
            i += 1

    os.makedirs(out_dir, exist_ok=True)
    spark = build_session("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = qs[name](spark, sf_dir)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        n_ex = text.count("Exchange")
        print(f"{name}: {len(text)} chars, {n_ex} Exchange -> {path}")


if __name__ == "__main__":
    main()
