"""Shuffle-partition-count sensitivity probe (r7, VERDICT r6 item 6).

Every recorded number so far ran at ``spark.sql.shuffle.partitions=32``
(sized to the local box).  On a real deployment this is the first knob
turned — at 100 TB an initial partition number in the thousands is
normal — so this probe answers: which query families are sensitive to
the partition count, and in which direction?

``spark.sql.shuffle.partitions`` is a runtime conf, so ONE session runs
every requested count (no JVM restart noise between legs); AQE stays ON
(the engine's default session), meaning the count is the INITIAL
shuffle partitioning that AQE coalesces — exactly how a cluster
deployment would experience it.  Each leg is one full pass over the
registered queries (minus the documented quadratic opt-ins) with
lineage cuts released between queries; per-family medians of the
per-query ratio vs the 32-partition leg are reported, because family
medians resist the per-query host noise a single pass carries.

Run on an idle box.  Usage:
    python tools/partition_probe.py [sf_dir] [count ...]
    (defaults: /tmp/sf1 32 128 512)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksql_linq_spark.session import build_session, release_lineage_cuts

SKIP = {"similarity_knn_graph", "dedup_ngram_jaccard", "dedup_embedding_cosine"}

FAMILIES = [
    "agg_", "join_", "asof_", "filter_", "orderby_", "setops_",
    "hopping_", "dsl_", "cascade_", "calendar_", "gapfill_", "session_",
    "trailing_", "window_", "mart_", "rollup_", "cube_", "pivot_",
    "unpivot_", "text_", "dataset_", "dedup_", "similarity_",
    "embedding_", "decontamination_", "approx_", "events_", "funnel_",
    "scd_", "psi_", "skew_", "count_", "context_", "retention_",
]


def family_of(name: str) -> str:
    for f in FAMILIES:
        if name.startswith(f):
            return f.rstrip("_")
    return "other"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    counts = [int(x) for x in sys.argv[2:]] or [32, 128, 512]

    import __spark_entry__ as entry_mod

    spark = build_session("partition-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = {n: f for n, f in entry_mod.queries().items() if n not in SKIP}

    # one untimed warm-up so JIT/footers are not charged to the first leg
    entry_mod.entry(spark).write.mode("overwrite").format("noop").save()

    legs: dict[int, dict[str, float]] = {}
    for c in counts:
        spark.conf.set("spark.sql.shuffle.partitions", str(c))
        timings: dict[str, float] = {}
        t_leg = time.perf_counter()
        for name, fn in qs.items():
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                timings[name] = round(time.perf_counter() - t0, 3)
            except Exception as e:  # noqa: BLE001 — probe must finish
                print(f"# error {name} @ {c}: {e}", file=sys.stderr)
                timings[name] = -1.0
            release_lineage_cuts(spark)
        legs[c] = timings
        print(f"leg partitions={c}: total "
              f"{sum(t for t in timings.values() if t >= 0):.1f}s "
              f"({time.perf_counter() - t_leg:.1f}s wall)")

    base = counts[0]
    table: list[dict] = []
    fams = sorted({family_of(n) for n in qs})
    for fam in fams:
        row: dict = {"family": fam}
        members = [n for n in qs if family_of(n) == fam]
        row["n"] = len(members)
        row["base_sec"] = round(
            sum(legs[base][n] for n in members if legs[base][n] >= 0), 2
        )
        for c in counts[1:]:
            ratios = [
                legs[c][n] / legs[base][n]
                for n in members
                if legs[base][n] > 0.15 and legs[c][n] > 0  # noise floor
            ]
            row[f"x{c}"] = round(statistics.median(ratios), 2) if ratios else None
        table.append(row)

    hdr = ["family", "n", "base_sec"] + [f"x{c}" for c in counts[1:]]
    print("\n" + " | ".join(f"{h:>14s}" for h in hdr))
    for row in table:
        print(" | ".join(f"{str(row.get(h, '')):>14s}" for h in hdr))

    out = {
        "sf_dir": sf_dir,
        "counts": counts,
        "per_query": legs,
        "family_median_ratio_vs_base": table,
    }
    with open("PARTITION_PROBE.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("\n-> PARTITION_PROBE.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
