"""Registered driver queries: Spark implementation + DuckDB oracle twins.

Each entry exercises one operator family from SURVEY.md §2.  The Spark
side goes through the engine's public API (query DSL / operators /
functions modules) wherever the operator has one; the oracle is plain
ANSI SQL for DuckDB over the same parquet views.

Determinism notes:
- money aggregates: per-row cast to DECIMAL → exact aggregation → cast
  DOUBLE (bit-identical across engines, stable DOUBLE schema).
- min_by/max_by orderings use columns verified duplicate-free per group.
- arrays compared sorted (collect_list order is nondeterministic).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import functions as KF
from .operators.ohlc import ohlc_bars
from .operators.windows import bucket_start
from .query.builder import from_df
from .sources import read_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _dec2dbl(c, p=18, s=2):
    """Exact-aggregation carrier: per-row decimal cast; caller sums then
    casts back to double."""
    return c.cast(f"decimal({p},{s})")


# ======================================================================
# Flagship: OHLC tumbling bars (SURVEY.md §2.5 W1, §2.4 A6)
# reference golden: tests/Query/Golden/bars_5m_live.sql
# ======================================================================


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ohlc_bars(
            ev,
            keys=["event_type"],
            ts_col="ts",
            price_col="value",
            timeframe="1m",
            extra_aggs=[F.count(F.lit(1)).alias("volume")],
        )
        .withColumn("open", F.round("open", 6))
        .withColumn("high", F.round("high", 6))
        .withColumn("low", F.round("low", 6))
        .withColumn("close", F.round("close", 6))
    )


q(
    "ohlc_1m_bars",
    oracle="""
    SELECT event_type,
           time_bucket(INTERVAL '1 minute', ts) AS bucket_start,
           round(arg_min(value, ts), 6) AS open,
           round(max(value), 6) AS high,
           round(min(value), 6) AS low,
           round(arg_max(value, ts), 6) AS close,
           count(*) AS volume
    FROM events
    GROUP BY 1, 2
    """,
)(flagship)


@q(
    "ohlc_5m_bars_multikey",
    oracle="""
    SELECT event_type,
           user_id % 10 AS shard,
           time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
           round(arg_min(value, ts), 6) AS open,
           round(max(value), 6) AS high,
           round(min(value), 6) AS low,
           round(arg_max(value, ts), 6) AS close,
           count(*) AS volume
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def ohlc_5m_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key bars (golden bars_5m_live.sql keys: broker, symbol)."""
    ev = _t(spark, sf_dir, "events").withColumn("shard", F.col("user_id") % 10)
    out = ohlc_bars(
        ev,
        keys=["event_type", "shard"],
        ts_col="ts",
        price_col="value",
        timeframe="5m",
        extra_aggs=[F.count(F.lit(1)).alias("volume")],
    )
    for c in ("open", "high", "low", "close"):
        out = out.withColumn(c, F.round(c, 6))
    return out


# ======================================================================
# §2.4 Aggregation — TPC-H-Q1-style pricing summary (A1-A5, P11/HAVING-free)
# ======================================================================


@q(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(22,6))) AS DOUBLE) AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_qty,
           CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    qy = (
        from_df(li)
        .where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .group_by("l_returnflag", "l_linestatus")
        .select(
            F.sum(_dec2dbl(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(_dec2dbl(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            F.sum(_dec2dbl(disc_price, 22, 6)).cast("double").alias("sum_disc_price"),
            F.sum(_dec2dbl(charge, 22, 6)).cast("double").alias("sum_charge"),
            (F.sum(_dec2dbl(F.col("l_quantity"))).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec2dbl(F.col("l_discount"))).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return qy.to_df()


@q(
    "agg_minmax_earliest_latest",
    oracle="""
    SELECT event_type,
           min(value) AS min_v, max(value) AS max_v,
           arg_min(value, ts) AS first_v, arg_max(value, ts) AS last_v,
           min(ts) AS first_ts, max(ts) AS last_ts
    FROM events GROUP BY event_type
    """,
)
def agg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 Max/Min + A6 Earliest/LatestByOffset on raw doubles."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        KF.Min("value").alias("min_v"),
        KF.Max("value").alias("max_v"),
        KF.EarliestByOffset("value", "ts").alias("first_v"),
        KF.LatestByOffset("value", "ts").alias("last_v"),
        KF.Min("ts").alias("first_ts"),
        KF.Max("ts").alias("last_ts"),
    )


@q(
    "agg_count_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS users, count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        KF.CountDistinct("user_id").alias("users"),
        KF.Count().alias("n"),
    )


@q(
    "agg_collect_topk",
    oracle="""
    SELECT event_type,
           list_sort(list(DISTINCT user_id % 100)) AS user_set,
           (list_sort(list(value), 'DESC'))[1:5] AS top5
    FROM events
    GROUP BY event_type
    """,
)
def agg_collect_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 CollectSet (sorted for comparison) + A10 TopK."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.array_sort(KF.CollectSet(F.col("user_id") % 100)).alias("user_set"),
        KF.TopK("value", 5).alias("top5"),
    )


@q(
    "agg_having",
    oracle="""
    SELECT o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
           count(*) AS n
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 3
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 Having (WHERE-after-GroupBy reclassification, P11)."""
    od = _t(spark, sf_dir, "orders")
    qy = (
        from_df(od)
        .group_by("o_custkey")
        .where(F.count(F.lit(1)) >= 3)  # reclassified to HAVING
        .select(
            F.sum(_dec2dbl(F.col("o_totalprice"))).cast("double").alias("spend"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return qy.to_df()


@q(
    "agg_histogram",
    oracle="""
    SELECT o_orderpriority AS k, count(*) AS cnt
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 Histogram — emitted as (value,count) rows: the scalable form of
    HISTOGRAM's MAP<v,count> (a map column at 100 TB key cardinality is a
    driver-killer; rows re-aggregate and spill)."""
    od = _t(spark, sf_dir, "orders")
    return od.groupBy(F.col("o_orderpriority").alias("k")).agg(F.count(F.lit(1)).alias("cnt"))


# ======================================================================
# §2.2 Projection / filter / predicates
# ======================================================================


@q(
    "filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS bucket
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice IS NOT NULL
      AND o_orderpriority LIKE '1-URGENT%'
      AND NOT (o_custkey = 0)
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3-P8, P10: IN, IS NOT NULL, StartsWith, bool negation, CASE WHEN."""
    od = _t(spark, sf_dir, "orders")
    qy = (
        from_df(od)
        .where(F.col("o_orderstatus").isin("O", "F"))
        .where(F.col("o_totalprice").isNotNull())
        .where(KF.StartsWith("o_orderpriority", "1-URGENT"))
        .where(~(F.col("o_custkey") == 0))
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            KF.Case(
                (F.col("o_totalprice") > 200000, F.lit("big")),
                (F.col("o_totalprice") > 100000, F.lit("mid")),
                default=F.lit("small"),
            ).alias("bucket"),
        )
    )
    return qy.to_df()


@q(
    "scalar_string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS uname,
           lower(p_brand) AS lbrand,
           substring(p_type, 1, 5) AS type5,
           length(p_name) AS name_len,
           trim(p_name) AS tname,
           replace(p_name, ' ', '_') AS uscore,
           contains(p_name, 'a') AS has_a,
           starts_with(p_type, 'STANDARD') AS is_std,
           concat(p_brand, ':', p_type) AS brand_type,
           strpos(p_name, 'e') AS e_pos,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4,
           left(p_name, 3) AS l3,
           right(p_name, 3) AS r3
    FROM part
    """,
)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 string registry over the engine's KSQL-named function surface."""
    pt = _t(spark, sf_dir, "part")
    return pt.select(
        "p_partkey",
        KF.UCase("p_name").alias("uname"),
        KF.LCase("p_brand").alias("lbrand"),
        KF.Substring("p_type", 1, 5).alias("type5"),
        KF.Len("p_name").alias("name_len"),
        KF.Trim("p_name").alias("tname"),
        KF.Replace("p_name", " ", "_").alias("uscore"),
        KF.Contains("p_name", "a").alias("has_a"),
        KF.StartsWith("p_type", "STANDARD").alias("is_std"),
        KF.Concat("p_brand", F.lit(":"), "p_type").alias("brand_type"),
        KF.IndexOf("p_name", "e").alias("e_pos"),
        KF.PadLeft(F.col("p_size").cast("string"), 4, "0").alias("size4"),
        KF.Left("p_name", 3).alias("l3"),
        KF.Right("p_name", 3).alias("r3"),
    )


@q(
    "scalar_math_date_functions",
    oracle="""
    SELECT o_orderkey,
           abs(o_totalprice - 150000) AS dist,
           round(o_totalprice, 1) AS rounded,
           floor(o_totalprice) AS flr,
           ceil(o_totalprice) AS cl,
           round(sqrt(o_totalprice), 6) AS sq,
           sign(o_totalprice - 150000) AS sgn,
           year(o_orderdate) AS y, month(o_orderdate) AS m,
           day(o_orderdate) AS d, hour(o_orderdate) AS h,
           dayofweek(o_orderdate) AS dow, dayofyear(o_orderdate) AS doy,
           o_orderdate + INTERVAL 3 DAY AS plus3d,
           o_orderdate + INTERVAL 90 MINUTE AS plus90m,
           strftime(o_orderdate, '%Y-%m-%d') AS fmt
    FROM orders
    """,
)
def scalar_math_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        KF.Abs(F.col("o_totalprice") - 150000).alias("dist"),
        KF.Round("o_totalprice", 1).alias("rounded"),
        KF.Floor("o_totalprice").alias("flr"),
        KF.Ceiling("o_totalprice").alias("cl"),
        F.round(KF.Sqrt("o_totalprice"), 6).alias("sq"),
        KF.Sign(F.col("o_totalprice") - 150000).cast("double").alias("sgn"),
        KF.Year("o_orderdate").alias("y"),
        KF.Month("o_orderdate").alias("m"),
        KF.Day("o_orderdate").alias("d"),
        KF.Hour("o_orderdate").alias("h"),
        # DuckDB dayofweek: 0=Sunday..6; Spark dayofweek: 1=Sunday..7
        (KF.DayOfWeek("o_orderdate") - 1).alias("dow"),
        KF.DayOfYear("o_orderdate").alias("doy"),
        KF.AddDays("o_orderdate", 3).alias("plus3d"),
        KF.AddMinutes("o_orderdate", 90).alias("plus90m"),
        KF.FormatTimestamp("o_orderdate", "yyyy-MM-dd").alias("fmt"),
    )


@q(
    "conditional_null_functions",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg,
           ifnull(nullif(c_acctbal, 0.0), -1.0) AS bal,
           (c_acctbal IS NULL) AS bal_null
    FROM customer
    """,
)
def conditional_null_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 null semantics + Coalesce/IfNull/NullIf (§2.7 conditional)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        KF.Coalesce(KF.NullIf(F.col("c_mktsegment"), "MACHINERY"), F.lit("OTHER")).alias("seg"),
        KF.IfNull(KF.NullIf(F.col("c_acctbal"), 0.0), -1.0).alias("bal"),
        F.col("c_acctbal").isNull().alias("bal_null"),
    )


# ======================================================================
# §2.3 Joins
# ======================================================================


@q(
    "join_inner_agg",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_inner_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 inner equi-join; customer side broadcast (small dim at any SF
    relative to orders — the 100 TB plan keeps the fact-side shuffle-free)."""
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    qy = (
        from_df(od)
        .join(cu, on=F.col("o_custkey") == F.col("c_custkey"), how="inner", broadcast=True)
        .group_by("c_mktsegment")
        .select(
            F.sum(_dec2dbl(F.col("o_totalprice"))).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("orders"),
        )
    )
    return qy.to_df()


@q(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 LEFT OUTER — the only other join form the reference supports."""
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    qy = (
        from_df(cu)
        .join(od, on=F.col("c_custkey") == F.col("o_custkey"), how="left")
        .group_by("c_custkey", "c_name")
        .select(F.count("o_orderkey").alias("n_orders"))
    )
    return qy.to_df()


@q(
    "join_multiway",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
           count(*) AS customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-way join superset (strict mode caps at 2 per JoinLimitationEnforcer;
    Spark has no such limit — broadcast both dims, zero fact shuffles)."""
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    re = _t(spark, sf_dir, "region")
    qy = (
        from_df(cu, strict=False)
        .join(na, on=F.col("c_nationkey") == F.col("n_nationkey"), broadcast=True)
        .join(re, on=F.col("n_regionkey") == F.col("r_regionkey"), broadcast=True)
        .group_by("r_name", "n_name")
        .select(
            F.sum(_dec2dbl(F.col("c_acctbal"))).cast("double").alias("total_bal"),
            F.count(F.lit(1)).alias("customers"),
        )
    )
    return qy.to_df()


@q(
    "join_windowed_within",
    oracle="""
    SELECT a.event_id AS purchase_id, b.event_id AS click_id,
           a.user_id, a.ts AS purchase_ts, b.ts AS click_ts
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'purchase' AND b.event_type = 'click'
     AND b.ts BETWEEN a.ts - INTERVAL 5 MINUTE AND a.ts
    """,
)
def join_windowed_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 stream-stream WITHIN join, batch semantics: time-interval join.
    (streaming twin with watermarks lives in streaming/windows.py)."""
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").alias("a")
    b = ev.filter(F.col("event_type") == "click").alias("b")
    return a.join(
        b,
        on=(
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") >= F.col("a.ts") - F.expr("INTERVAL 5 MINUTES"))
            & (F.col("b.ts") <= F.col("a.ts"))
        ),
        how="inner",
    ).select(
        F.col("a.event_id").alias("purchase_id"),
        F.col("b.event_id").alias("click_id"),
        F.col("a.user_id").alias("user_id"),
        F.col("a.ts").alias("purchase_ts"),
        F.col("b.ts").alias("click_ts"),
    )


# ======================================================================
# §2.6 Sort / limit / top-k
# ======================================================================


@q(
    "orderby_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 OrderBy + O2 Take→LIMIT (deterministic tiebreaker on key)."""
    od = _t(spark, sf_dir, "orders")
    qy = (
        from_df(od)
        .select("o_orderkey", "o_totalprice")
        .order_by(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .take(10)
    )
    return qy.to_df()


@q(
    "topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 2
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 Limit-retention analog (keep newest/top N per key via row_number;
    reference: client-side EventSetExtensions.Limit, EventSetExtensions.cs:35-60)."""
    from pyspark.sql import Window

    od = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        od.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        ).filter(F.col("rn") <= 2)
    )


@q("count_star", oracle="SELECT count(*) AS n FROM lineitem")
def count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 COUNT query (DMLQueryGenerator.cs:91-106)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(F.count(F.lit(1)).alias("n"))


# ======================================================================
# §2.5 Windowing (batch expressions; streaming twins in streaming/)
# ======================================================================


@q(
    "hopping_window_counts",
    oracle="""
    WITH hops AS (
      SELECT e.*, time_bucket(INTERVAL '5 minutes', ts) AS base,
             unnest([0, 1, 2]) AS k
      FROM events e)
    SELECT event_type,
           base - (k * INTERVAL '5 minutes') AS window_start,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM hops
    WHERE base - (k * INTERVAL '5 minutes') >= TIMESTAMP '2024-01-01 00:00:00'
    GROUP BY 1, 2
    """,
)
def hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 Hopping: SIZE 15m ADVANCE BY 5m via F.window(ts, 15m, 5m).

    Oracle replays Spark's semantics (each row lands in size/advance
    windows); Spark's window() only emits windows with start >= epoch-aligned
    boundaries — both sides clamp to the data's month so the sets match.
    """
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.window("ts", "15 minutes", "5 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec2dbl(F.col("value"), 18, 6)).cast("double").alias("total"),
        )
        .filter(F.col("window.start") >= F.lit("2024-01-01").cast("timestamp"))
        .select(
            "event_type",
            F.col("window.start").alias("window_start"),
            "n",
            "total",
        )
    )


@q(
    "calendar_month_window",
    oracle="""
    SELECT event_type, CAST(date_trunc('month', ts) AS TIMESTAMP) AS month_start,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM events GROUP BY 1, 2
    """,
)
def calendar_month_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 1mo calendar bucket — date_trunc, not fixed-duration window()."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", bucket_start("ts", "1mo").alias("month_start")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec2dbl(F.col("value"), 18, 6)).cast("double").alias("total"),
    )


@q(
    "calendar_week_window",
    oracle="""
    SELECT event_type, time_bucket(INTERVAL '1 week', ts) AS week_start,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def calendar_week_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W11 weekly bars, Monday anchor (time_bucket '1 week' is Monday-anchored,
    matching date_trunc('week') ISO semantics)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", bucket_start("ts", "1wk").alias("week_start")
    ).agg(F.count(F.lit(1)).alias("n"))
