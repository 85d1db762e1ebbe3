"""Gap-fill / continuation: synthesize missing time buckets per key,
carrying the last close forward.

Reference semantics (W8, /root/reference/src/Runtime/RowMonitor.cs:749-787
+ synthetic row builder :1280-1330): with ``continuation: true`` the 1 s
hub emits, for every key, filler rows for each bucket between the last
observed bucket and the current one, with open=high=low=close = previous
close and volume 0.

Batch form (:func:`gap_fill_bars`): per-key time spine via
``sequence(min_bucket, max_bucket)`` + explode + ``last(close)
ignorenulls`` carry-forward window.  One shuffle (the window partition),
spine generation is a flatMap — scales linearly with keys × buckets.

Streaming form (:func:`streaming_gap_fill`): ``applyInPandasWithState``
keeping (last_bucket, last_close) per key — state is O(keys), exactly the
reference's RowMonitor memory bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .windows import timeframe_seconds


def gap_fill_bars(
    bars: DataFrame,
    keys: list[str],
    bucket_col: str,
    timeframe: str,
    ohlc: tuple[str, str, str, str] = ("open", "high", "low", "close"),
    volume_col: str | None = None,
) -> DataFrame:
    """Fill missing buckets per key between each key's min and max bucket.

    Filler rows carry the previous close as open/high/low/close and 0
    volume — byte-for-byte the reference's synthetic-row semantics.
    """
    step = timeframe_seconds(timeframe)
    if step is None:
        raise ValueError("gap-fill needs a fixed-duration timeframe")
    o, h, l, c = ohlc

    spine = (
        bars.groupBy(*keys)
        .agg(F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi"))
        .select(
            *keys,
            F.explode(
                F.sequence("_lo", "_hi", F.expr(f"INTERVAL {step} SECONDS"))
            ).alias(bucket_col),
        )
    )
    joined = spine.join(bars, on=[*keys, bucket_col], how="left")
    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_close = F.last(F.col(c), ignorenulls=True).over(w)
    # dict keyed by alias: tolerates o==h==l==c (close-only gap fill)
    out_cols = {name: F.coalesce(F.col(name), prev_close) for name in (o, h, l, c)}
    if volume_col:
        out_cols[volume_col] = F.coalesce(F.col(volume_col), F.lit(0))
    filled = joined.select(
        *keys,
        F.col(bucket_col),
        *[expr.alias(name) for name, expr in out_cols.items()],
        F.col(c).isNull().alias("is_synthetic"),
    )
    return filled


def streaming_gap_fill(
    bars: DataFrame,
    key: str,
    bucket_col: str,
    close_col: str,
    timeframe: str,
    grace: str = "10 seconds",
) -> DataFrame:
    """Streaming continuation via applyInPandasWithState.

    State per key: (last_bucket_epoch, last_close).  On each batch, emits
    the new bars plus synthetic (bucket, prev_close) rows for any gap
    between state and the earliest new bucket, then advances state.
    Output schema: key, bucket, close, is_synthetic.
    """
    import pandas as pd  # noqa: PLC0415 — executor-side import

    step = timeframe_seconds(timeframe)
    if step is None:
        raise ValueError("streaming gap-fill needs a fixed-duration timeframe")

    out_schema = T.StructType(
        [
            T.StructField(key, T.StringType()),
            T.StructField(bucket_col, T.TimestampType()),
            T.StructField(close_col, T.DoubleType()),
            T.StructField("is_synthetic", T.BooleanType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("last_bucket_epoch", T.LongType()),
            T.StructField("last_close", T.DoubleType()),
        ]
    )

    def fn(key_tuple, pdf_iter, state):
        import datetime as dt

        (k,) = key_tuple
        if state.exists:
            last_epoch, last_close = state.get
        else:
            last_epoch, last_close = None, None
        rows: list[tuple] = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(bucket_col)
            for _, r in pdf.iterrows():
                epoch = int(r[bucket_col].timestamp())
                if last_epoch is not None:
                    gap = last_epoch + step
                    while gap < epoch:  # synthesize missing buckets
                        rows.append(
                            (k, dt.datetime.utcfromtimestamp(gap), last_close, True)
                        )
                        gap += step
                rows.append((k, r[bucket_col].to_pydatetime(), float(r[close_col]), False))
                last_epoch, last_close = epoch, float(r[close_col])
        if last_epoch is not None:
            state.update((last_epoch, last_close))
        yield pd.DataFrame(rows, columns=[key, bucket_col, close_col, "is_synthetic"])

    return bars.groupBy(key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", "NoTimeout"
    )


def interpolate_linear(
    df: DataFrame,
    keys: list[str],
    bucket_col: str,
    value_col: str,
    timeframe: str,
) -> DataFrame:
    """Linear-interpolation gap fill: missing buckets between each key's
    first and last observation get ``prev + (next-prev) * elapsed_frac``
    instead of the carry-forward close (:func:`gap_fill_bars`) — the
    time-series variant every feature/metrics pipeline needs when the
    quantity is a level, not a last-trade price.

    Same topology as the carry-forward path: per-key ``sequence`` spine
    (flatMap, spine size = keys × buckets, independent of row volume) +
    ONE window shuffle computing both neighbors.  prev/next are the
    nearest non-null observations strictly before/after; inside the
    [min, max] spine both always exist for a missing bucket.  The
    arithmetic is fixed-order IEEE binary64 (div, mul, add), so engines
    agree bit-for-bit before any cosmetic rounding.
    """
    step = timeframe_seconds(timeframe)
    if step is None:
        raise ValueError("interpolation needs a fixed-duration timeframe")

    spine = (
        df.groupBy(*keys)
        .agg(F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi"))
        .select(
            *keys,
            F.explode(
                F.sequence("_lo", "_hi", F.expr(f"INTERVAL {step} SECONDS"))
            ).alias(bucket_col),
        )
    )
    joined = spine.join(df, on=[*keys, bucket_col], how="left")
    back = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fwd = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    obs_ts = F.when(v.isNotNull(), F.col(bucket_col))
    prev_v = F.last(v, ignorenulls=True).over(back)
    prev_ts = F.last(obs_ts, ignorenulls=True).over(back)
    next_v = F.first(v, ignorenulls=True).over(fwd)
    next_ts = F.first(obs_ts, ignorenulls=True).over(fwd)
    # timestamp→double is fractional epoch seconds (µs-exact), matching
    # DuckDB's epoch(); unix_timestamp() would truncate to seconds and
    # silently mis-weight sub-second buckets
    frac = (
        F.col(bucket_col).cast("double") - prev_ts.cast("double")
    ) / (next_ts.cast("double") - prev_ts.cast("double"))
    interp = prev_v + (next_v - prev_v) * frac
    return joined.select(
        *keys,
        F.col(bucket_col),
        F.coalesce(v, interp).alias(value_col),
        v.isNull().alias("is_synthetic"),
    )
