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


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    key_cols: list[str],
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time (as-of-dimension) join: each fact row picks the
    dimension version whose validity interval contains its timestamp —
    the lookup that makes :func:`scd2_history` a feature store
    (training-serving skew dies here: a model trained with point-in-
    time features never sees the future).

    Interval containment is ``valid_from <= ts < valid_to`` with an
    open-ended current version (NULL valid_to).  Because versions
    partition time per key, at most ONE history row matches — no
    fan-out.  The plan is an equi-join on the key with the interval
    predicate as a residual filter: it shuffles on the key (or
    broadcasts a small dimension), never a range-explode — version
    count per key, not corpus size, bounds the join's candidate rows.
    """
    h = history.select(
        *[F.col(c).alias(f"_h_{c}") for c in history.columns]
    )
    cond = None
    for k in key_cols:
        c = facts[k] == h[f"_h_{k}"]
        cond = c if cond is None else cond & c
    ts = facts[fact_ts]
    cond = (
        cond
        & (ts >= h[f"_h_{valid_from}"])
        & (h[f"_h_{valid_to}"].isNull() | (ts < h[f"_h_{valid_to}"]))
    )
    joined = facts.join(h, cond, how)
    keep = [
        F.col(f"_h_{c}").alias(c)
        for c in history.columns
        if c not in set(key_cols)
    ]
    return joined.select(*[facts[c] for c in facts.columns], *keep)
