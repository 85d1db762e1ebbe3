"""Per-table scan-multiplicity audit over every registered query.

Catalyst does not reuse exchanges across differently-pruned branches of
a shared DataFrame (column pruning rewrites each branch's aggregate into
a different canonical shape, so ReuseExchange never matches) — a query
whose final plan scans the same table N times is re-running its shared
subtree N times.  This audit found the round-5 lineage-cut batch:
tokenize/shingle/percentile subtrees silently re-ran 2-5x in nine
queries (see SCALING.md "Known costs accepted deliberately" for the
cut decision rule and measurements).

Multi-scans are NOT automatically defects — self-joins, set ops, and
cheap narrow re-reads (a scan with pushdown is often cheaper than a
materialization) are legitimate.  The audit surfaces candidates; the
decision rule picks the cuts:

  cut  = duplicated subtree is expensive per row (regex tokenize,
         shingling, exact percentile) AND the shared frame is smaller
         than its source
  keep = branch re-runs only a scan/filter or a key-local window over
         a narrow frame (measured cheaper to recompute)

Usage:  python tools/scan_audit.py [sf_dir] [min_scans]
Prints queries scanning any single table >= min_scans (default 2) times,
with per-table counts.  Counts are read from the INITIAL physical plan
(``executedPlan()`` before any action prints AdaptiveSparkPlan with
isFinalPlan=false) — scan multiplicity is AQE-invariant (AQE re-plans
exchanges, never adds or removes leaf scans), so the counts equal the
final plan's; trigger an action first if a true post-AQE plan is ever
needed for other node types.  Inspect the top entries after adding
operators or refactoring plans.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksql_linq_spark.session import build_session  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    min_scans = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    import __spark_entry__ as entry_mod

    spark = build_session("scan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    flagged = []
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # audit everything; report what broke
            print(f"ERR {name}: {str(e)[:100]}")
            continue
        tabs = re.findall(r"/(\w+)\.parquet", plan)
        multi = {t: n for t, n in Counter(tabs).items() if n >= min_scans}
        if multi:
            flagged.append((max(multi.values()), name, multi))
    flagged.sort(reverse=True)
    for _, name, multi in flagged:
        print(f"{name}: {multi}")
    print(f"{len(flagged)} queries scan a table >={min_scans}x "
          f"(of {len(qs)}); see module docstring for the cut rule")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
