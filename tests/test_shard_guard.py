"""The shards-per-node <= cores deployment rule as a code guard (r12,
VERDICT r11 item 2).

The r11 strong-scaling probe (SCALING.md round-11) measured a node whose
state-shard allocation reaches 2x its cores sustaining NOTHING at any
input rate (16 shards on 8 cores: both 45k and 180k rows/s fail with the
same ~12.5 s mean batch — a rate-independent commit fixed-cost floor),
while every sustained leg kept shards <= cores.  These tests pin the
heuristic to that artifact (STREAM_THROUGHPUT.json v6) so the guard and
the measurement can never drift apart silently.
"""

from __future__ import annotations

import json
import os
import re

import pytest

from ksql_linq_spark.streaming.stateful import (
    SHARD_COLLAPSE_RATIO,
    shard_allocation_verdict,
    warn_if_shards_exceed_cores,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_safe_allocations_are_silent():
    # Every sustained r11 config kept shards <= cores: the 32-core
    # record (16 shards), the 16-core leg (16 shards), and the
    # proportional quarter-node (4 shards on 8 cores).
    assert shard_allocation_verdict(16, 32, 4) is None
    assert shard_allocation_verdict(16, 16, 4) is None
    assert shard_allocation_verdict(4, 8, 4) is None
    assert shard_allocation_verdict(32, 32, 4) is None
    # Unknown core count (cores <= 0) must never warn: no evidence.
    assert shard_allocation_verdict(64, 0, 4) is None


def test_collapse_ratio_uses_measured_wording():
    # The measured cliff itself: 16 shards x 4 stateful queries on 8
    # cores = 64 commits/trigger, sustained NOTHING at any rate.
    msg = shard_allocation_verdict(16, 8, 4)
    assert msg is not None
    assert "64 state-store commits" in msg
    assert "NOTHING" in msg
    assert "STREAM_THROUGHPUT.json" in msg


def test_oversubscribed_but_unmeasured_band_warns_softly():
    # Between 1x and 2x cores is uncharted: warn with the rule, not
    # the collapse claim.
    msg = shard_allocation_verdict(12, 8, 2)
    assert msg is not None
    assert "NOTHING" not in msg
    assert "shards-per-node <= cores" in msg
    assert "24 state-store commits" in msg


def test_ratio_constant_matches_artifact():
    """The collapse legs in STREAM_THROUGHPUT.json v6 must agree with
    the guard: every @shN@cN run where the verdict says collapse has
    zero sustained legs, and every run the verdict passes has at least
    one sustained leg."""
    with open(os.path.join(REPO, "STREAM_THROUGHPUT.json")) as fh:
        doc = json.load(fh)
    assert doc["version"] >= 6
    n_stateful = 4  # the composed flagship: gate -> hub -> 1m/5m -> gapfill
    checked = 0
    for run_key, run in doc["runs"].items():
        m = re.search(r"@sh(\d+)@c(\d+)", run_key)
        if not m:
            continue
        shards, cores = int(m.group(1)), int(m.group(2))
        verdict = shard_allocation_verdict(shards, cores, n_stateful)
        sustained = [leg for leg in run["legs"] if leg.get("sustained")]
        if shards >= SHARD_COLLAPSE_RATIO * cores:
            assert verdict is not None and "NOTHING" in verdict, run_key
            assert not sustained, (
                f"{run_key}: guard predicts collapse but a leg sustained"
            )
        elif shards <= cores:
            assert verdict is None, run_key
            assert sustained, (
                f"{run_key}: guard passes but no leg sustained"
            )
        checked += 1
    # The artifact must actually contain the 8-core collapse evidence.
    assert checked >= 3
    assert "rocksdb_cl@100000@sh16@c8" in doc["runs"]
    assert not any(
        leg.get("sustained")
        for leg in doc["runs"]["rocksdb_cl@100000@sh16@c8"]["legs"]
    )


def test_ensure_rocksdb_provider_applies_the_rule(spark):
    # Provider selection is the hook every stateful topology passes
    # through; an oversubscribed session warns there too.
    from ksql_linq_spark.streaming.stateful import ensure_rocksdb_provider

    prov_key = "spark.sql.streaming.stateStore.providerClass"
    old_shards = spark.conf.get("spark.sql.shuffle.partitions")
    old_prov = spark.conf.get(prov_key, None)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "16")
        with pytest.warns(UserWarning, match="state-shard allocation"):
            ensure_rocksdb_provider(spark)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shards)
        if old_prov is None:
            try:
                spark.conf.unset(prov_key)
            except Exception:  # noqa: BLE001 — not set before
                pass
        else:
            spark.conf.set(prov_key, old_prov)


def test_session_wrapper_reads_conf_and_warns(spark):
    # conftest session is local[4] with 4 shuffle partitions: silent.
    assert warn_if_shards_exceed_cores(spark, 4) is None
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        with pytest.warns(UserWarning, match="state-shard allocation"):
            msg = warn_if_shards_exceed_cores(spark, 4)
        assert msg is not None and "32 state-store commits" in msg
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_cascade_publishes_misconfiguration_incident(spark, tmp_path):
    """An oversubscribed session starting the cascade publishes the
    shard-rule violation to a wired incident bus (operational surface
    of the warning, so a deployed monitor sees it too)."""
    import datetime as dt
    import warnings as _warnings

    from ksql_linq_spark.operators.cascade import (
        CascadePlan,
        start_streaming_cascade,
    )
    from ksql_linq_spark.streaming.incidents import IncidentBus

    schema = "event_type string, ts timestamp, value double"
    spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), 1.0)], schema
    ).coalesce(1).write.mode("append").parquet(f"{tmp_path}/src")
    stream = spark.readStream.schema(schema).parquet(f"{tmp_path}/src")
    plan = CascadePlan(
        base_name="sg", keys=["event_type"], ts_col="ts",
        price_col="value", timeframes=["5m"],
    )
    bus = IncidentBus()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    queries, shim = [], None
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "16")  # 4x cores
        with _warnings.catch_warnings():
            _warnings.simplefilter("ignore")  # asserted via the bus
            queries, shim = start_streaming_cascade(
                plan, stream, sink_dir=f"{tmp_path}/sink",
                checkpoint_dir=f"{tmp_path}/ckpt", incident_bus=bus,
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        for q in queries:
            q.stop()
        if shim is not None:
            spark.streams.removeListener(shim)
    inc = bus.recent("misconfiguration")
    assert inc, "no misconfiguration incident published"
    assert inc[0].details["rule"] == "shards_per_node_lte_cores"
    assert "NOTHING" in inc[0].details["message"]
    assert inc[0].query_name == plan.hub_name
