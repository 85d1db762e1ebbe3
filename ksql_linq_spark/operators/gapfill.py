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
        # Vectorized gap synthesis (r9): the original iterrows() loop
        # was row-at-a-time Python INSIDE the Arrow batch and dominated
        # the composed streaming pipeline's batch time once 100k keys'
        # bars flush at once (15.7 s batches at 60k rows/s in the r9
        # --composed probe).  Gap counts come from integer bucket
        # arithmetic; variable-length gap runs expand via
        # repeat + arange, no per-row Python.
        import numpy as np

        (k,) = key_tuple
        if state.exists:
            last_epoch, last_close = state.get
        else:
            last_epoch, last_close = None, None
        outs: list[pd.DataFrame] = []
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(bucket_col)
            epochs = (pdf[bucket_col].astype("int64") // 10**9).to_numpy()
            closes = pdf[close_col].astype("float64").to_numpy()
            if last_epoch is None:
                # no state: the first row opens the series, no gap before it
                prev_e = np.concatenate(([epochs[0]], epochs[:-1]))
                prev_c = np.concatenate(([closes[0]], closes[:-1]))
            else:
                prev_e = np.concatenate(([last_epoch], epochs[:-1]))
                prev_c = np.concatenate(([last_close], closes[:-1]))
            counts = np.maximum((epochs - prev_e) // step - 1, 0)
            real = pd.DataFrame({
                key: k,
                bucket_col: pdf[bucket_col].to_numpy(),
                close_col: closes,
                "is_synthetic": False,
            })
            n_gaps = int(counts.sum())
            if n_gaps:
                idx = np.repeat(np.arange(len(epochs)), counts)
                within = np.arange(n_gaps) - np.repeat(
                    np.cumsum(counts) - counts, counts
                )
                gap_e = prev_e[idx] + (within + 1) * step
                synth = pd.DataFrame({
                    key: k,
                    bucket_col: pd.to_datetime(gap_e, unit="s"),
                    close_col: prev_c[idx],
                    "is_synthetic": True,
                })
                out = pd.concat([real, synth], ignore_index=True)
                out = out.sort_values(bucket_col, ignore_index=True)
            else:
                out = real
            outs.append(out)
            last_epoch, last_close = int(epochs[-1]), float(closes[-1])
        if last_epoch is not None:
            state.update((last_epoch, last_close))
        if outs:
            yield pd.concat(outs, ignore_index=True)
        else:
            yield pd.DataFrame(
                {key: pd.Series(dtype="object"),
                 bucket_col: pd.Series(dtype="datetime64[ns]"),
                 close_col: pd.Series(dtype="float64"),
                 "is_synthetic": pd.Series(dtype="bool")}
            )

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
