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


SUMMARY = re.compile(r"^(\d+)/(\d+) pass", re.MULTILINE)


def parse(log_text: str) -> dict[str, dict]:
    queries: dict[str, dict] = {}
    for m in LINE.finditer(log_text):
        status, name, rows, sec, detail = m.groups()
        if status == "PASS" and rows is not None:
            queries[name] = {
                "status": "PASS",
                "rows": int(rows),
                "sec": float(sec),
            }
        elif status == "PASS":
            # a progress-bar write interleaved mid-line can leave a
            # PASS line whose rows/sec didn't parse — record it as
            # mangled rather than crash (int(None)) or silently claim
            # a clean PASS
            queries[name] = {"status": "MANGLED",
                             "detail": (detail or "")[:200]}
        else:
            queries[name] = {"status": "FAIL", "detail": (detail or "")[:200]}
    return queries


def summary_counts(log_text: str) -> tuple[int, int] | None:
    """check.py's trailing 'N/M pass' line, or None if absent."""
    matches = SUMMARY.findall(log_text)
    if not matches:
        return None
    n, m = matches[-1]
    return int(n), int(m)


def main() -> int:
    if len(sys.argv) < 5:
        print(__doc__, file=sys.stderr)
        return 2
    log_path, sf_dir, k, out_path = sys.argv[1:5]
    note = sys.argv[5] if len(sys.argv) > 5 else ""
    with open(log_path) as fh:
        log_text = fh.read()
    queries = parse(log_text)
    failures = sum(1 for v in queries.values() if v["status"] != "PASS")
    # cross-check against check.py's own trailing summary so a line
    # the regex missed can never silently understate coverage
    summary = summary_counts(log_text)
    consistent = True
    if summary is None:
        print("WARNING: no 'N/M pass' summary line in the log — "
              "the sweep may have died mid-run", file=sys.stderr)
        consistent = False
    else:
        n_pass, n_total = summary
        parsed_pass = sum(
            1 for v in queries.values() if v["status"] == "PASS"
        )
        if (n_total, n_pass) != (len(queries), parsed_pass):
            print(f"WARNING: parsed {parsed_pass}/{len(queries)} but the "
                  f"log's own summary says {n_pass}/{n_total} — some "
                  "result lines were mangled or dropped",
                  file=sys.stderr)
            consistent = False
    out = {
        "sf_dir": sf_dir,
        "k": int(k),
        "total": len(queries),
        "failures": failures,
        "note": note,
        "queries": queries,
    }
    if summary is not None:
        out["log_summary"] = {"pass": summary[0], "total": summary[1]}
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"{len(queries)} queries, {failures} failures -> {out_path}")
    return 0 if failures == 0 and consistent else 1


if __name__ == "__main__":
    sys.exit(main())
