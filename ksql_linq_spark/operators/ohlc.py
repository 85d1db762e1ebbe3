"""OHLC bar aggregation — the reference's flagship domain feature.

Reference semantics (golden /root/reference/tests/Query/Golden/bars_5m_live.sql;
example /root/reference/examples/designtime-ksql-tumbling/Program.cs:50-63):

    open  = EARLIEST_BY_OFFSET(price)
    high  = MAX(price)
    low   = MIN(price)
    close = LATEST_BY_OFFSET(price)
    GROUP BY keys, WINDOW TUMBLING (SIZE tf)

Batch has no Kafka offset, so "offset order" is defined as
(event_time, tiebreaker_id) — deterministic min_by/max_by on a struct
(SURVEY.md §7 risk register).  All built-in aggregates: partial-agg
(map-side combine) applies, single shuffle on (keys, bucket), survives
any scale; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .windows import bucket_start


def ohlc_bars(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    price_col: str,
    timeframe: str,
    tiebreaker: str | None = None,
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """Aggregate ticks into OHLC bars for one timeframe.

    Output: keys..., bucket_start TIMESTAMP, open, high, low, close
    (+ volume-ish extra aggs).  One shuffle on (keys, bucket).
    """
    order = (
        F.struct(F.col(ts_col), F.col(tiebreaker))
        if tiebreaker
        else F.col(ts_col)
    )
    price = F.col(price_col)
    aggs = [
        F.min_by(price, order).alias("open"),
        F.max(price).alias("high"),
        F.min(price).alias("low"),
        F.max_by(price, order).alias("close"),
    ] + (extra_aggs or [])
    return (
        df.groupBy(
            *[F.col(k) for k in keys],
            bucket_start(ts_col, timeframe).alias("bucket_start"),
        )
        .agg(*aggs)
    )
