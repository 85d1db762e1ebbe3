"""As-of join: match each left row to the nearest right row in time.

The reference engine accepts only equality conjunctions in JOIN ON
(src/Query/Builders/Statements/KsqlCreateStatementBuilder.cs:392-394) —
no as-of/range/theta joins.  SURVEY.md §2.3 flags the as-of join as the
optional superset a time-series engine wants (quote-to-trade matching,
"latest purchase before this click"); this module supplies it.

Semantics (DuckDB/pandas ``merge_asof`` compatible):

- ``direction="backward"``: greatest ``right.ts <= left.ts`` per key
  (inclusive; ``strict=True`` makes it ``<``).
- ``direction="forward"``: smallest ``right.ts >= left.ts`` per key.
- ``tolerance`` (seconds): a match further than this from the left
  timestamp is discarded (row kept with NULLs under ``how="left"``,
  dropped under ``how="inner"``).

Scale: implemented as **union + per-key ordered window carry-forward** —
the left and right sides are unioned, partitioned by the join keys,
sorted by timestamp, and the last-seen right ROW (a struct, so a NULL
payload value is still "a match") is carried onto each left row.  That
is ONE shuffle on the join keys and zero pairwise candidate expansion,
unlike a range-join formulation whose candidate set grows with the
bucket width.  Skewed keys split via AQE like any other window; at
cluster scale the sort is per-partition (no global sort).

The right side must be unique per (keys, ts) — pre-aggregate duplicates
(the window tie-break between equal right timestamps is otherwise
nondeterministic).  Timestamp comparisons use ``unix_micros`` so the
tolerance boundary is exact at microsecond precision (bit-parity with
DuckDB's ``INTERVAL`` arithmetic; see tools/check.py oracle gate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

# Both timestamp flavors compare identically once carried as integer µs
# (NTZ values are interpreted in the UTC session tz, matching the oracle).
_TS_TYPES = (TimestampType, TimestampNTZType)


def _ts_as_long(df: DataFrame, col: str) -> Column:
    """Order/compare carrier: exact integer µs for timestamps, raw value
    otherwise (double would lose µs precision at the tolerance boundary)."""
    if isinstance(df.schema[col].dataType, _TS_TYPES):
        return F.unix_micros(F.col(col).cast("timestamp"))
    return F.col(col)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    *,
    direction: str = "backward",
    strict: bool = False,
    tolerance: float | None = None,
    how: str = "left",
) -> DataFrame:
    """Nearest-in-time join.  Returns every left column plus the right
    payload columns (everything except ``on``/``right_ts``) and the
    matched ``right_ts`` itself; unmatched left rows keep NULLs
    (``how="left"``) or are dropped (``how="inner"``).

    Right payload/timestamp column names must not collide with left
    columns — rename on the right side first (keeps the API explicit
    instead of inventing suffix rules).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    payload = [c for c in right.columns if c not in on and c != right_ts]
    clash = [c for c in payload + [right_ts] if c in left.columns]
    if clash:
        raise ValueError(f"right columns collide with left: {clash}; rename them")

    is_ts = isinstance(right.schema[right_ts].dataType, _TS_TYPES)
    if is_ts != isinstance(left.schema[left_ts].dataType, _TS_TYPES):
        raise ValueError("left_ts and right_ts must both be timestamps or both numeric")

    r = right.select(
        *[F.col(k) for k in on],
        _ts_as_long(right, right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__matched_ts"),
            _ts_as_long(right, right_ts).alias("__matched_ts_long"),
            *[F.col(c) for c in payload],
        ).alias("__r"),
    )
    l = left.select(
        "*",
        _ts_as_long(left, left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    ts_ord = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    # Tie order decides whether an equal-timestamp right row is visible:
    # inclusive -> right sorts before left, strict -> after.
    side_ord = F.col("__side").desc() if strict else F.col("__side").asc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_ord, side_ord)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )

    valid = F.col("__m").isNotNull()
    if tolerance is not None:
        delta = F.col("__ts") - F.col("__m.__matched_ts_long")
        if direction == "forward":
            delta = -delta
        bound = int(round(tolerance * 1_000_000)) if is_ts else tolerance
        valid = valid & (delta <= F.lit(bound))

    out = u.withColumn("__ok", valid)
    out = out.withColumn(right_ts, F.when(F.col("__ok"), F.col("__m.__matched_ts")))
    for c in payload:
        out = out.withColumn(c, F.when(F.col("__ok"), F.col(f"__m.{c}")))
    if how == "inner":
        out = out.filter(F.col("__ok"))
    return out.drop("__ts", "__side", "__r", "__m", "__ok")
