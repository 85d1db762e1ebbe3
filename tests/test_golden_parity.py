"""Structural parity against the reference's checked-in golden DDL.

The reference pins its cascade/join contract in golden KSQL text
(/root/reference/tests/Query/Golden/*.sql — rendered by
GoldenBarsLiveSqlTests.cs et al.).  The Spark engine has no KSQL text
to diff byte-for-byte, so these tests compare STRUCTURE: each golden's
load-bearing facts (names, tier set, window kind/size, grouping keys,
emit policy per role, grace/retention defaults, WITHIN default) are
parsed out of the golden file and asserted against the engine's
design-time metadata (`cascade_ddl_meta`) and live plans.

Divergences that are deliberate are asserted AS divergences here so
they stay visible: event-time open/close carriers instead of offset
order, hub partial columns, and the WINDOWSTART->EndTs fixup being
structurally impossible in Spark (both window bounds are always
surfaced as real columns).

Skipped wholesale when the reference snapshot is not mounted — the
repo must stay standalone.
"""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from tests.conftest import *  # noqa: F401,F403 — spark fixture

GOLDEN = "/root/reference/tests/Query/Golden"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLDEN), reason="reference golden snapshot not mounted"
)


def golden(name: str) -> str:
    with open(os.path.join(GOLDEN, name)) as f:
        return f.read().lower()


def _plan():
    from ksql_linq_spark.operators.cascade import CascadePlan

    return CascadePlan(
        base_name="bar",
        keys=["broker", "symbol"],
        ts_col="timestamp",
        price_col="price",
        timeframes=["5m", "15m", "60m"],
    )


def test_golden_rows_1s_stream_hub_contract():
    """rows_1s_stream.sql: hub STREAM name, key columns, timestamp
    designation, and the 7 d retention default."""
    from ksql_linq_spark.operators.cascade import (
        DEFAULT_ROWS_STREAM_RETENTION_MS,
        cascade_ddl_meta,
    )

    sql = golden("rows_1s_stream.sql")
    meta = cascade_ddl_meta(_plan())
    hub = meta["hub"]

    m = re.search(r"create stream if not exists (\w+)\(", sql)
    assert m and hub["name"] == m.group(1) == "bar_1s_rows"
    assert hub["kind"] == "stream"
    # golden declares each key column as `<name> varchar key`
    for k in hub["keys"]:
        assert re.search(rf"{k} \w+ key", sql), k
    m = re.search(r"timestamp='(\w+)'", sql)
    assert m and hub["timestamp"] == m.group(1)
    m = re.search(r"retention_ms=(\d+)", sql)
    assert m and hub["retention_ms"] == int(m.group(1))
    assert DEFAULT_ROWS_STREAM_RETENTION_MS == int(m.group(1)) == 604_800_000
    # Final1sStream role: the golden hub DDL carries NO emit clause
    assert "emit" not in sql and hub["emit"] is None


@pytest.mark.parametrize("fname,tf", [
    ("bars_5m_live.sql", "5m"),
    ("bars_15m_live.sql", "15m"),
    ("bars_60m_live.sql", "60m"),
])
def test_golden_live_tier_contract(fname, tf):
    """bars_{tf}_live.sql: tier TABLE name, hub as the ONLY source,
    tumbling window size, grouping keys, EMIT CHANGES, and the OHLC
    aggregate role mapping (event-time carriers replacing offset
    order — the documented deliberate divergence)."""
    from ksql_linq_spark.operators.cascade import cascade_ddl_meta

    sql = golden(fname)
    meta = cascade_ddl_meta(_plan())
    tier = next(t for t in meta["tiers"] if t["name"].endswith(f"_{tf}_live"))

    m = re.search(r"create table if not exists (\w+) ", sql)
    assert m and tier["name"] == m.group(1)
    assert tier["kind"] == "table"
    # the tier's FROM is the hub, never the raw tick stream
    m = re.search(r"from (\w+) window", sql)
    assert m and tier["source"] == m.group(1) == "bar_1s_rows"
    # window tumbling(size N minutes)
    m = re.search(r"window tumbling\(size (\d+) minutes\)", sql)
    assert m and tier["window"] == "tumbling"
    assert tier["size_seconds"] == int(m.group(1)) * 60
    # group by the declared keys, in order
    m = re.search(r"group by ([\w, ]+?)\s*emit", sql)
    assert m and tier["group_by"] == [k.strip() for k in m.group(1).split(",")]
    # Live role: EMIT CHANGES
    assert "emit changes" in sql and tier["emit"] == "CHANGES"
    # aggregate roles: golden uses offset order, engine uses the
    # event-time twins — pin BOTH sides so the divergence stays visible
    assert "earliest_by_offset(open)" in sql
    assert "latest_by_offset(ksqltimeframeclose)" in sql
    assert "max(high)" in sql and "min(low)" in sql
    assert tier["aggregates"]["open"] == "min_by(open, first_ts)"
    assert tier["aggregates"]["close"] == "max_by(close, last_ts)"
    assert tier["aggregates"]["high"] == "max(high)"
    assert tier["aggregates"]["low"] == "min(low)"
    # grace adopted as-is, no per-timeframe auto-increment
    # (DerivationPlanner.cs:43) — default 1 s on every tier
    assert tier["grace_seconds"] == 1


def test_golden_tier_plans_use_declared_aggregates(spark):
    """The LIVE plans must actually carry the aggregate roles the meta
    declares — pin min_by/max_by/max/min in the analyzed rollup plan
    and bucket_start (golden: `windowstart as bucketstart`,
    bars_1m_live_whenempty.sql) in every tier's output."""
    from ksql_linq_spark.operators.cascade import build_cascade

    plan = _plan()
    ticks = spark.createDataFrame(
        [("b1", "s1", "2026-01-01 00:00:00.100", 10.0),
         ("b1", "s1", "2026-01-01 00:00:02.500", 11.0)],
        "broker string, symbol string, ts_raw string, price double",
    ).select(
        "broker", "symbol",
        F.col("ts_raw").cast("timestamp").alias("timestamp"), "price",
    )
    tiers = build_cascade(plan, ticks)
    assert set(tiers) == {
        "bar_1s_rows", "bar_5m_live", "bar_15m_live", "bar_60m_live",
    }
    for name, df in tiers.items():
        assert "bucket_start" in df.columns, name
        plan_str = df._jdf.queryExecution().analyzed().toString()
        assert "min_by(open" in plan_str or "min_by(price" in plan_str \
            or "min_by('open" in plan_str or name == "bar_1s_rows", name
    # composition correctness at the 60m tier (one bar, right OHLC)
    row = tiers["bar_60m_live"].collect()[0]
    assert (row["open"], row["high"], row["low"], row["close"]) == (
        10.0, 11.0, 10.0, 11.0,
    )


def test_golden_join_within_default_equals_explicit_300s(spark):
    """join_within_default.sql == join_within_explicit_300s.sql modulo
    the sink name: the implicit WITHIN default IS 300 s.  Pin the two
    goldens' equivalence, the engine default constant, and that the
    engine's default-within plan is IDENTICAL to the explicit-300 plan."""
    from ksql_linq_spark.streaming.windows import (
        DEFAULT_JOIN_WITHIN_SECONDS,
        stream_stream_join,
    )

    d = golden("join_within_default.sql")
    e = golden("join_within_explicit_300s.sql")
    assert "within 300 seconds" in d and "within 300 seconds" in e
    # identical DDL once the sink names are normalized
    norm = lambda s: s.replace("join_default", "X").replace("join_explicit", "X")
    assert norm(d) == norm(e)
    assert DEFAULT_JOIN_WITHIN_SECONDS == 300

    orders = spark.readStream.format("rate").load().select(
        F.col("value").alias("customerid"),
        F.col("timestamp").alias("ots"),
    )
    custs = spark.readStream.format("rate").load().select(
        F.col("value").alias("customerid"),
        F.col("timestamp").alias("cts"),
    )
    def norm_plan(df):
        # strip per-instance noise: expression ids (#123) and JVM
        # object identities (@1a2b3c) differ across invocations
        s = df._jdf.queryExecution().analyzed().toString()
        s = re.sub(r"@[0-9a-f]+", "@", re.sub(r"#\d+", "#", s))
        return re.sub(
            r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}",
            "<uuid>", s,  # EventTimeWatermark node ids are per-instance
        )

    default_plan = norm_plan(
        stream_stream_join(orders, custs, ["customerid"], "ots", "cts")
    )
    explicit_plan = norm_plan(
        stream_stream_join(
            orders, custs, ["customerid"], "ots", "cts", within_seconds=300
        )
    )
    assert default_plan == explicit_plan
    assert "300" in default_plan  # the bound made it into the condition


def test_golden_fill_join_semantics(spark):
    """bars_1m_final.sql / bars_prev_1m.sql: the gap-fill contract —
    heartbeat LEFT JOIN live LEFT JOIN prev with COALESCE carry-forward
    on (keys, bucketstart).  The engine expresses the same contract as
    a key-local window (gapfill.carry_forward_fill): every missing
    bucket exists in the output and carries the previous close — the
    exact value the golden's coalesce(l.close, p.close) produces."""
    sql = golden("bars_1m_final.sql")
    # pin the golden's own structure first
    assert sql.count("left join") == 2
    assert "coalesce(l.close, p.close)" in sql
    for k in ("broker", "symbol", "bucketstart"):
        assert f"h.key->{k} = l.key->{k}" in sql

    from ksql_linq_spark.operators.gapfill import gap_fill_bars

    bars = spark.createDataFrame(
        [("s1", 0, 10.0), ("s1", 120, 12.0)],  # bucket 60 missing
        "symbol string, bucket_start long, close double",
    ).select(
        "symbol",
        F.timestamp_seconds("bucket_start").alias("bucket_start"),
        "close",
    )
    filled = gap_fill_bars(
        bars, keys=["symbol"], bucket_col="bucket_start", timeframe="1m",
        ohlc=("close", "close", "close", "close"),
    )
    rows = {r["bucket_start"].second + r["bucket_start"].minute * 60:
            (r["close"], r["is_synthetic"]) for r in filled.collect()}
    assert rows[60] == (10.0, True)   # coalesce(l.close, p.close) ≙ carry
    assert rows[0] == (10.0, False) and rows[120] == (12.0, False)


def test_golden_keypath_styles_collapse_to_one_plan(spark):
    """keypath_{arrow,dot,none}.sql: the three KeyPathStyle renderings
    (key->broker / key.broker / bare broker — RenderOptions.cs:3-8,
    auto-detected Arrow for tables, None for streams) are TEXT variants
    of one query: same aggregates, same grouping, same output schema.
    Spark keys are plain columns, so the style axis is structurally
    inapplicable — pin that the three goldens agree modulo the key
    prefix, and that the engine's composite-key groupBy covers them."""
    texts = {s: golden(f"keypath_{s}.sql") for s in ("arrow", "dot", "none")}
    # strip the style prefix and the sink name: all three must coincide
    norm = {}
    for s, t in texts.items():
        t = t.replace(f"keypath_{s}", "SINK")
        t = t.replace("key->", "").replace("key.", "")
        norm[s] = t
    assert norm["arrow"] == norm["dot"] == norm["none"]
    # every variant: sum(qty) grouped by (broker, symbol), emit changes
    assert "sum(qty)as total" in norm["none"]
    assert "group by broker, symbol" in norm["none"]
    assert "emit changes" in norm["none"]

    df = spark.createDataFrame(
        [("b1", "s1", 2.0), ("b1", "s1", 3.0), ("b2", "s1", 5.0)],
        "broker string, symbol string, qty double",
    )
    out = df.groupBy("broker", "symbol").agg(F.sum("qty").alias("total"))
    rows = {(r["broker"], r["symbol"]): r["total"] for r in out.collect()}
    assert rows == {("b1", "s1"): 5.0, ("b2", "s1"): 5.0}


def test_golden_partition_by_composite_group(spark):
    """partition_by_variants.sql: a composite GROUP BY re-keys the sink
    on the grouping columns (key_format='kafka').  Spark analog: the
    grouped output carries every grouping column, in declaration order,
    as its key columns — the partitioning/primary-key contract."""
    sql = golden("partition_by_variants.sql")
    m = re.search(r"group by ([\w, ]+?)\s*emit", sql)
    assert m and [c.strip() for c in m.group(1).split(",")] == [
        "customerid", "id",
    ]
    df = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10)], "id long, customerid long"
    )
    out = df.groupBy("customerid", "id").agg(F.count(F.lit(1)).alias("n"))
    assert out.columns[:2] == ["customerid", "id"]
    assert out.count() == 3


def test_golden_windowstart_endts_fixup_is_structurally_impossible(spark):
    """KsqlCreateWindowedStatementBuilder.cs:211 rewrites the textual
    projection `WINDOWSTART AS ENDTS` to `WINDOWEND AS EndTs` — a
    fixup for a mistake only expressible in SQL text.  The Spark
    engine surfaces BOTH window bounds as real columns on every
    windowed aggregate, so the mistake cannot be written: pin that
    window_start and window_end are always present and end-start ==
    the declared size (what the fixup guarantees for the reader)."""
    from ksql_linq_spark.streaming.windows import windowed_aggregate

    ev = spark.createDataFrame(
        [("a", "2026-01-01 00:00:30", 1.0)],
        "k string, ts_raw string, v double",
    ).select("k", F.col("ts_raw").cast("timestamp").alias("ts"), "v")
    out, _mode = windowed_aggregate(
        ev, ["k"], "ts", [F.sum("v").alias("s")], "5 minutes"
    )
    assert {"window_start", "window_end"} <= set(out.columns)
    row = out.collect()[0]
    assert (row["window_end"] - row["window_start"]).total_seconds() == 300
