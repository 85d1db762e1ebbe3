"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship OHLC bar query (the reference's
flagship domain feature, SURVEY.md §0) at sf0.001.  ``queries()`` exposes
one callable per implemented operator from SURVEY.md §2, each with a
DuckDB-oracle twin in ``oracle_sql()``.

Float determinism strategy: money aggregates are cast per-row to DECIMAL
(exact, associative aggregation — immune to Spark/DuckDB summation-order
differences), aggregated, then cast back to DOUBLE so both engines emit
bit-identical values with a plain DOUBLE schema.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from pyspark.sql import DataFrame, SparkSession

from ksql_linq_spark.entry_queries import QUERIES, ORACLES, flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def _scoring_history() -> dict[str, tuple[int, bool]]:
    """Map query name -> (latest round scored, that scoring passed).

    The driver scores the flagship + the first N registered queries; with
    ~2N registered, a fixed order would leave the tail permanently
    unscored.  Ordering rotates every query through the correctness
    gate across rounds."""
    import glob
    import json
    import re

    seen: dict[str, tuple[int, bool]] = {}
    for p in sorted(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(p) as f:
                data = json.load(f)
        except Exception:
            continue
        if isinstance(data, dict):
            for name, row in data.items():
                ok = isinstance(row, dict) and bool(
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match") is not False
                    and not row.get("err")
                )
                prev = seen.get(name)
                if prev is None or rnd >= prev[0]:
                    seen[name] = (rnd, ok)
    return seen


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registration order = the driver's scoring order.  Three tiers:
    (1) queries whose LATEST scoring failed — their fixes must be
    re-verified before anything else; (2) never-scored queries;
    (3) green queries, least-recently-scored first.  Within a tier,
    original registration position (stable)."""
    seen = _scoring_history()
    pos = {n: i for i, n in enumerate(QUERIES)}

    def key(n: str):
        if n in seen:
            rnd, ok = seen[n]
            tier = 2 if ok else 0
            return (tier, rnd, pos[n])
        return (1, -1, pos[n])

    order = sorted(QUERIES, key=key)
    return {n: QUERIES[n] for n in order}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
