"""Parse a tools/check.py log into a SCALE_SWEEP_*.json artifact.

check.py prints one `PASS  name: N rows (T s)` / `FAIL  name: ...` line
per query (possibly interleaved with Spark progress-bar noise); prior
rounds assembled the sweep artifact by hand.  Usage:

    python tools/check.py /tmp/sf1 2>&1 | tee /tmp/check_sf1.log
    python tools/sweep_to_json.py /tmp/check_sf1.log /tmp/sf1 10 \
        SCALE_SWEEP_sf1_r12.json ["note..."]
"""

from __future__ import annotations

import json
import re
import sys

LINE = re.compile(
    r"(PASS|FAIL)\s\s(\w+): (?:(\d+) rows \((\d+(?:\.\d+)?)s\)|(.*))"
)


def parse(log_text: str) -> dict[str, dict]:
    queries: dict[str, dict] = {}
    for m in LINE.finditer(log_text):
        status, name, rows, sec, detail = m.groups()
        if status == "PASS":
            queries[name] = {
                "status": "PASS",
                "rows": int(rows),
                "sec": float(sec),
            }
        else:
            queries[name] = {"status": "FAIL", "detail": (detail or "")[:200]}
    return queries


def main() -> int:
    if len(sys.argv) < 5:
        print(__doc__, file=sys.stderr)
        return 2
    log_path, sf_dir, k, out_path = sys.argv[1:5]
    note = sys.argv[5] if len(sys.argv) > 5 else ""
    with open(log_path) as fh:
        queries = parse(fh.read())
    failures = sum(1 for v in queries.values() if v["status"] != "PASS")
    out = {
        "sf_dir": sf_dir,
        "k": int(k),
        "total": len(queries),
        "failures": failures,
        "note": note,
        "queries": queries,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"{len(queries)} queries, {failures} failures -> {out_path}")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
