"""Skew-mitigation utilities: salted aggregation + salted broadcast-free join.

At 100 TB a handful of hot keys (one dominant event_type, a null-heavy
join key) can pin a whole stage on one reducer.  AQE's skewedJoin split
(`spark.sql.adaptive.skewJoin.enabled`, on in session.py) handles
sort-merge-join skew at runtime; these helpers cover the two cases AQE
does not re-plan:

- **aggregation skew** — :func:`salted_agg` runs GROUP BY in two stages:
  stage 1 groups on (key, salt) so a hot key spreads over ``salt_buckets``
  reducers, stage 2 re-combines the per-salt partials.  Only usable for
  re-aggregable functions (sum/count/min/max — the same composition rule
  the OHLC cascade uses, operators/cascade.py).
- **join skew with a medium right side** — :func:`salted_join` explodes
  the right side ``salt_buckets`` times and salts the left randomly, so
  one hot left key hashes to many partitions.  Use when the right side is
  too big to broadcast but small enough to replicate per salt.

The salt is deterministic (pmod of a hash of a tiebreaker column), so
results stay reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(col: Column, buckets: int) -> Column:
    return F.pmod(F.hash(col), F.lit(buckets))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple],
    salt_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage GROUP BY for skewed keys.

    ``aggs`` maps output column -> (stage1_fn, stage2_fn, input_col), e.g.
    ``{"n": (F.count, F.sum, F.lit(1)), "total": (F.sum, F.sum, "value"),
    "hi": (F.max, F.max, "value")}``: stage1_fn aggregates input_col
    under (keys, salt); stage2_fn re-combines the partials under keys
    alone.  count re-combines with sum; avg must be carried as
    sum+count (it does not compose — same rule as the OHLC hub).

    Equivalent result to ``df.groupBy(keys).agg(...)`` — the point is the
    shuffle shape: a key with 10^9 rows becomes ``salt_buckets`` partial
    groups of 10^9/buckets rows each, then ``salt_buckets`` tiny rows.
    """
    salted = df.withColumn("_salt", _salt(F.col(salt_col), salt_buckets))
    stage1 = salted.groupBy(*keys, "_salt").agg(
        *[fn1(col).alias(f"_p_{name}") for name, (fn1, _fn2, col) in aggs.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[
            fn2(f"_p_{name}").alias(name)
            for name, (_fn1, fn2, _col) in aggs.items()
        ]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    salt_buckets: int = 16,
    how: str = "inner",
    left_salt_col: str | None = None,
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over salt buckets.

    The right side is exploded ``salt_buckets`` times (every right row
    exists under every salt), the left side gets one deterministic salt
    — from ``left_salt_col`` if given (any column that varies within
    the hot keys, e.g. a row id), else a hash of the whole left row.
    Join keys become (on..., _salt), so one hot key's rows land on
    ``salt_buckets`` different reducers.
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    if left_salt_col is not None:
        salt_expr = _salt(F.col(left_salt_col), salt_buckets)
    else:
        # Default: hash the WHOLE left row.  The salt must vary WITHIN a
        # hot key to spread it (a join-key-derived salt is constant per
        # key — zero spread exactly where it matters); the full-row hash
        # varies with the non-key columns and stays deterministic.  Rows
        # that are complete duplicates share a salt — acceptable: their
        # per-bucket share shrinks 1/buckets for every distinct value
        # pattern.  Salt choice only routes rows; the join OUTPUT is
        # identical for any salt assignment.
        salt_expr = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt_buckets))
    l = left.withColumn("_salt", salt_expr)
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return l.join(r, on=on_cols + ["_salt"], how=how).drop("_salt")
