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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
