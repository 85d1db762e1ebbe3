"""Deterministic K-times scale-up of a driver SF dir (default 10x of
sf0.1 -> "sf1") for upward-scale validation.

The driver ships sf0.001/0.01/0.1; the unprobed direction is UP.  This
tool replicates every fact table K times with per-replica key remapping
so the scaled dataset keeps sf0.1's per-key cardinalities (each replica
joins to its own replica of its dimensions — a 10x corpus, not a 100x
join fan-out):

- region/nation stay fixed (TPC-H semantics: they never scale);
- every key column is shifted by ``replica * offset`` where the offset
  is the next power of 10 above the key domain's max, keeping replica 0
  bit-identical to the source and remapped keys human-readable;
- foreign keys shift by their OWNING domain's offset (o_custkey moves
  with customer's offset), preserving referential integrity per replica;
- timestamps, text, embeddings, and all measure columns are copied
  verbatim: event streams get 10x rows AND 10x users per time bucket,
  and the document corpus becomes the 10x exact-duplication
  (boilerplate-adversarial) regime — deliberately, since that is the
  regime the dedup/decontamination scale paths exist for.

Because tools/check.py points BOTH engines (Spark and the DuckDB
oracle) at the same directory, correctness comparison is valid at any
generated scale.

Usage: python tools/make_scaled_sf.py [src_dir] [dst_dir] [K]
       (defaults: /root/testdata/sf0.1 /tmp/sf1 10)
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pyarrow.parquet as pq


def _duckdb_mem_gb(cap_gb: int = 32) -> int:
    """Buffer-pool bound for the scale-up COPYs: min(cap, ~60% of
    physical RAM).  A flat 32 GB told DuckDB it could use 2x physical
    memory on a 16 GB host — the explicit bound must never RAISE the
    limit above what the adaptive default would have picked."""
    try:
        phys = (os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES"))
        return max(1, min(cap_gb, int(phys * 0.6 / 1e9)))
    except (ValueError, OSError):
        return min(cap_gb, 4)

# key domain -> (owning table, key column); offsets derive from these
DOMAINS = {
    "C": ("customer", "c_custkey"),
    "S": ("supplier", "s_suppkey"),
    "P": ("part", "p_partkey"),
    "O": ("orders", "o_orderkey"),
    "E": ("events", "event_id"),
    "U": ("events", "user_id"),
    "D": ("documents", "doc_id"),
    "V": ("embeddings", "vec_id"),
}

# table -> {key column -> domain}; tables absent here are fixed dims
REMAP = {
    "customer": {"c_custkey": "C"},
    "supplier": {"s_suppkey": "S"},
    "part": {"p_partkey": "P"},
    "orders": {"o_orderkey": "O", "o_custkey": "C"},
    "lineitem": {"l_orderkey": "O", "l_partkey": "P", "l_suppkey": "S"},
    "events": {"event_id": "E", "user_id": "U"},
    "documents": {"doc_id": "D"},
    "embeddings": {"vec_id": "V"},
}

FIXED = ["region", "nation"]


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # At K>=1000 an order-preserving parallel COPY of the replica
    # cross-product buffers the whole intermediate (measured ~80 GB RSS
    # with zero bytes flushed on 600M lineitem rows before this was
    # set).  Replica order is meaningless to every consumer — the
    # invariant harness and oracle both canon-sort — so let the writer
    # stream, and bound the buffer pool explicitly.
    con.execute("SET preserve_insertion_order=false")
    con.execute(f"SET memory_limit='{_duckdb_mem_gb()}GB'")

    offsets: dict[str, int] = {}
    for dom, (table, col) in DOMAINS.items():
        mx = con.execute(
            f"SELECT max({col}) FROM read_parquet('{src}/{table}.parquet')"
        ).fetchone()[0]
        offsets[dom] = 10 ** math.ceil(math.log10(int(mx) + 2))

    for t in FIXED:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT parquet)"
        )
        print(f"{t}: copied (fixed dim)")

    for t, remap in REMAP.items():
        # resume support: a killed large-K run leaves complete tables
        # behind; skip any dst table that already has exactly K x base
        # rows (a partial COPY leaves 0 rows or errors on read)
        dst_file = f"{dst}/{t}.parquet"
        if os.path.exists(dst_file) and os.path.getsize(dst_file) > 0:
            try:
                have = pq.read_metadata(dst_file).num_rows
                want = k * pq.read_metadata(f"{src}/{t}.parquet").num_rows
                if have == want:
                    print(f"{t}: {have} rows already present, skipped")
                    continue
            except Exception:
                pass
        cols = [f.name for f in pq.read_schema(f"{src}/{t}.parquet")]
        exprs = ", ".join(
            f"{c} + r * {offsets[remap[c]]} AS {c}" if c in remap else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {exprs} "
            f"FROM read_parquet('{src}/{t}.parquet'), range({k}) s(r)) "
            f"TO '{dst}/{t}.parquet' (FORMAT parquet)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows ({k}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
