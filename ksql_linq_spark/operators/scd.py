"""Slowly-changing-dimension (type 2) history from an event/changelog
stream.

The reference materializes only the LATEST value per key (ksqlDB TABLE
semantics — src/Runtime/TimeBucket.cs pull reads, the Streamiz RocksDB
cache); a warehouse additionally needs the full version history with
validity intervals.  This operator derives it from the same changelog:
consecutive runs of identical attribute values per key collapse into one
version row ``(key, attrs…, valid_from, valid_to, is_current)``.

Dataflow: one key-partitioned window computes the previous row's
attributes (lag) → change flags → a running version counter; a groupBy
on (key, version) collapses runs; a second window (same partitioning —
AQE reuses the exchange) assigns each version's ``valid_to`` from the
next version's ``valid_from``.  Everything is key-local: 1–2 shuffles on
the dimension key regardless of history depth, no collect, no Python.
At 100 TB the key-hash shuffle is the unavoidable minimum for this
semantics; skewed hot keys split under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse an ordered event log into type-2 dimension versions.

    A new version opens whenever ANY attribute differs (null-safely)
    from the key's previous event.  ``valid_from`` = first event time of
    the run; ``valid_to`` = next version's ``valid_from`` (NULL on the
    current version); ``is_current`` flags the open row.  Ordering
    within a key is (ts, *tiebreak_cols) — pass a unique tiebreak for
    deterministic output when timestamps collide.
    """
    order = [F.col(ts_col), *[F.col(c) for c in (tiebreak_cols or [])]]
    w = Window.partitionBy(*key_cols).orderBy(*order)

    changed = F.lit(False)
    for a in attr_cols:
        prev = F.lag(F.col(a)).over(w)
        changed = changed | ~F.col(a).eqNullSafe(prev)
    is_first = F.row_number().over(w) == 1
    opens = (is_first | changed).cast("int")

    versioned = df.withColumn(
        "_version",
        F.sum(opens).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    runs = versioned.groupBy(*key_cols, "_version").agg(
        F.min(ts_col).alias("valid_from"),
        *[F.first(a).alias(a) for a in attr_cols],
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy(*key_cols).orderBy("_version")
    nxt = F.lead("valid_from").over(wv)
    return runs.select(
        *key_cols,
        *attr_cols,
        F.col("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        F.col("n_events"),
    )
