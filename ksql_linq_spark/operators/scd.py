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
    weight_col: str | None = None,
) -> DataFrame:
    """Collapse an ordered event log into type-2 dimension versions.

    A new version opens whenever ANY attribute differs (null-safely)
    from the key's previous event.  ``valid_from`` = first event time of
    the run; ``valid_to`` = next version's ``valid_from`` (NULL on the
    current version); ``is_current`` flags the open row.  Ordering
    within a key is (ts, *tiebreak_cols) — pass a unique tiebreak for
    deterministic output when timestamps collide.

    ``weight_col`` makes ``n_events`` a weighted sum instead of a count
    — the hook :func:`scd2_apply_batch` uses to fold an already-
    collapsed current version (weight = its prior n_events) into a new
    batch without losing the tally.
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
    tally = (
        F.sum(F.col(weight_col)).cast("bigint")
        if weight_col
        else F.count(F.lit(1))
    )
    runs = versioned.groupBy(*key_cols, "_version").agg(
        F.min(ts_col).alias("valid_from"),
        *[F.first(a).alias(a) for a in attr_cols],
        tally.alias("n_events"),
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


def scd2_apply_batch(
    history: DataFrame,
    batch: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Incrementally maintain an SCD2 history: fold a new batch of
    events into an existing :func:`scd2_history` table WITHOUT
    reprocessing the closed past — the micro-batch form (call it from
    ``foreachBatch`` against the stored history, exactly like
    operators/incremental.py maintains aggregates).

    Invariant (the whole point, pinned by test):
    ``apply(apply(hist, b1), b2) == scd2_history(b1 ∪ b2)`` for batches
    arriving in event-time order.  Mechanics: closed versions pass
    through untouched; each key's OPEN version re-enters the collapse
    as one pseudo-event at its ``valid_from`` carrying its accumulated
    ``n_events`` as weight — if the batch's first attrs match, the run
    extends seamlessly (same valid_from, counts add); if not, it closes
    at the first differing event.  Cost per batch: the key-local
    windows over (open versions + batch), never the full history.

    Assumes batch events are not earlier than their key's open
    ``valid_from`` (the contract of an in-order changelog; late data
    needs a rebuild of the affected keys, same as every SCD2 store).
    """
    tiebreaks = tiebreak_cols or []
    cur = history.filter(F.col("is_current"))
    closed = history.filter(~F.col("is_current"))

    pseudo = cur.select(
        *key_cols,
        F.col("valid_from").alias(ts_col),
        *attr_cols,
        # the open version predates every batch row for its key; NULL
        # tiebreaks sort first on ts collisions (Spark asc = nulls
        # first), typed from the BATCH schema so string/long/any
        # tiebreak columns union cleanly
        *[
            F.lit(None).cast(batch.schema[c].dataType).alias(c)
            for c in tiebreaks
        ],
        F.col("n_events").alias("_w"),
    )
    batch_ev = batch.select(
        *key_cols,
        F.col(ts_col),
        *attr_cols,
        *[F.col(c) for c in tiebreaks],
        F.lit(1).cast("bigint").alias("_w"),
    )
    merged = pseudo.unionByName(batch_ev)
    fresh = scd2_history(
        merged,
        key_cols,
        ts_col,
        attr_cols,
        tiebreak_cols=tiebreaks,
        weight_col="_w",
    )
    return closed.unionByName(fresh)
