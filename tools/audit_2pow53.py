"""Systematic 2^53 DECIMAL->DOUBLE audit (r7, VERDICT r6 item 1).

The 1-ulp class: an exact decimal aggregate whose UNSCALED integer
(value * 10^scale) exceeds 2^53 casts to DOUBLE 1 ulp apart across
engines (DuckDB converts int128 then divides; Spark's BigDecimal cast
is correctly rounded).  r6 caught `agg_pricing_summary` only because
10x happened to cross the threshold; other money aggregates cross at
30-100x.  This tool finds them BEFORE the SF where they bite:

1. map each registered query to its source (inspect.getsource) and
   keep those that route values through a decimal cast (the exact-sum
   discipline) AND emit float64 columns;
2. run each at the given SF dir, measure max |value| per float64
   column;
3. extrapolate: the crossing multiplier M = 2^53 / (maxabs * 10^s)
   (s = the largest decimal scale the query uses) is the data scale-up
   at which the unscaled sum crosses 2^53.  M is conservative for
   per-key aggregates (group count grows with SF, per-group magnitude
   does not — the scaler adds replicas of keys) and tight for
   fixed-cardinality groups (returnflag, month, nation, ...).

Queries already carrying the floor-to-money-scale fix are reported
with `floored=True` so reviewed-and-safe sites are visible.  Direct
`F.floor(F.sum(...))` is detected textually; fixes that floor an
ALIASED sum (e.g. join_promo_revenue floors `F.col("promo")` where
`promo` is the summed decimal) are not statically traceable, so those
live in REVIEWED_FLOORED below — add a query there only after reading
its source and confirming every at-risk float64 output is floored to a
fixed scale before the DOUBLE cast.

Usage: python tools/audit_2pow53.py [sf_dir] [target_multiplier]
       (defaults: /root/testdata/sf0.1 100)
"""

from __future__ import annotations

import inspect
import json
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from ksql_linq_spark.session import build_session

TWO53 = float(2**53)

# Queries whose floor-to-money-scale fix is applied to an ALIASED sum
# (invisible to the textual `F.floor(F.sum` probe).  Reviewed by hand:
# join_promo_revenue (entry_queries.py: promo_d/total_d floor the
# summed decimals to cents before the DOUBLE cast; promo_pct derives
# from the floored values — SCALING.md r7, crossing moved ~12.6x->inf).
REVIEWED_FLOORED = {"join_promo_revenue"}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    target = float(sys.argv[2]) if len(sys.argv) > 2 else 100.0

    qs = entry_mod.queries()
    candidates: dict[str, tuple[int, bool]] = {}
    for name, fn in qs.items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            continue
        scales = [int(m) for m in re.findall(r"decimal\(\s*\d+\s*,\s*(\d+)\s*\)", src)]
        scales += [2] * len(re.findall(r"_dec2dbl\(\s*[^,)]+\)", src))  # default p=18,s=2
        for m in re.findall(r"_dec2dbl\([^)]*,\s*\d+\s*,\s*(\d+)\s*\)", src):
            scales.append(int(m))
        if not scales:
            continue
        floored = ("F.floor(F.sum" in src or "floor(F.sum" in src
                   or name in REVIEWED_FLOORED)
        candidates[name] = (max(scales), floored)

    print(f"{len(candidates)} queries route through decimal casts; "
          f"measuring magnitudes at {sf_dir} (target multiplier {target:g}x)")

    spark = build_session("audit-2pow53")
    report = []
    for name in sorted(candidates):
        s, floored = candidates[name]
        try:
            pdf = qs[name](spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001 — audit must finish
            report.append({"query": name, "error": str(exc)[:200]})
            continue
        worst = None
        for col in pdf.columns:
            if str(pdf[col].dtype) != "float64" or len(pdf) == 0:
                continue
            maxabs = float(pdf[col].abs().max())
            if not math.isfinite(maxabs) or maxabs == 0.0:
                continue
            mult = TWO53 / (maxabs * 10**s)
            if worst is None or mult < worst["crossing_multiplier"]:
                worst = {
                    "query": name,
                    "column": col,
                    "max_abs": maxabs,
                    "scale": s,
                    "floored": floored,
                    "crossing_multiplier": mult,
                }
        if worst:
            worst["at_risk"] = worst["crossing_multiplier"] < target and not floored
            report.append(worst)

    report.sort(key=lambda r: r.get("crossing_multiplier", float("inf")))
    for r in report:
        if "error" in r:
            print(f"ERROR {r['query']}: {r['error']}")
            continue
        flag = "AT-RISK" if r["at_risk"] else ("floored" if r["floored"] else "ok")
        print(
            f"{flag:8s} {r['query']:42s} {r['column']:28s} "
            f"max|v|={r['max_abs']:.3e} scale={r['scale']} "
            f"crosses at {r['crossing_multiplier']:.1f}x"
        )
    out = {
        "sf_dir": sf_dir,
        "target_multiplier": target,
        "at_risk": [r["query"] for r in report if r.get("at_risk")],
        "rows": report,
    }
    with open("AUDIT_2POW53.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"\n{len(out['at_risk'])} at-risk queries -> AUDIT_2POW53.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
