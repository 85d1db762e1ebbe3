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


class _FakeConf:
    def __init__(self, values):
        self._values = values

    def get(self, key, default=None):
        return self._values.get(key, default)


class _FakeContext:
    def __init__(self, default_parallelism):
        self.defaultParallelism = default_parallelism


class _FakeClusterSession:
    """Session shim for the non-local master path: _session_cores must
    fall back to defaultParallelism (= total executor cores on a real
    cluster), which local-mode tests can never reach (VERDICT r12
    item 5)."""

    def __init__(self, master, shards, default_parallelism):
        self.conf = _FakeConf({
            "spark.master": master,
            "spark.sql.shuffle.partitions": shards,
        })
        self.sparkContext = _FakeContext(default_parallelism)


def test_cluster_master_uses_default_parallelism():
    # spark://: 200 default shards on a 64-core cluster is the classic
    # oversubscription (>= 2x) — the guard must see cores=64 via
    # defaultParallelism and emit the measured-collapse wording.
    sess = _FakeClusterSession("spark://host:7077", "200", 64)
    with pytest.warns(UserWarning, match="state-shard allocation"):
        msg = warn_if_shards_exceed_cores(sess, 4)
    assert msg is not None
    assert "200 shuffle partitions" in msg
    assert "64 cores" in msg
    assert "800 state-store commits" in msg
    assert "NOTHING" in msg
    # a right-sized cluster allocation is silent
    assert warn_if_shards_exceed_cores(
        _FakeClusterSession("yarn", "64", 64), 4) is None
    # soft band on a cluster: warn with the rule, not the collapse
    msg = warn_if_shards_exceed_cores(
        _FakeClusterSession("k8s://api", "96", 64), 2)
    assert msg is not None and "NOTHING" not in msg


def test_cluster_master_without_parallelism_evidence_is_silent():
    # defaultParallelism unavailable/zero: no evidence, never warn
    sess = _FakeClusterSession("spark://host:7077", "200", 0)
    assert warn_if_shards_exceed_cores(sess, 4) is None

    class _Broken(_FakeClusterSession):
        @property
        def sparkContext(self):
            raise RuntimeError("no context")

    sess = _Broken.__new__(_Broken)
    sess.conf = _FakeConf({"spark.master": "spark://h:7077",
                           "spark.sql.shuffle.partitions": "200"})
    assert warn_if_shards_exceed_cores(sess, 4) is None


def test_unparseable_shard_conf_skips_check():
    # r12 ADVICE: a non-integer spark.sql.shuffle.partitions (e.g.
    # 'auto' on AQE-managed platforms) used to warn on a fabricated
    # shards=200; now it skips like the cores<=0 no-evidence rule.
    sess = _FakeClusterSession("spark://host:7077", "auto", 8)
    assert warn_if_shards_exceed_cores(sess, 4) is None


def test_ensure_rocksdb_provider_shard_check_opt_out(spark):
    # r12 ADVICE: ensure_rocksdb_provider then start_streaming_cascade
    # used to warn twice with conflicting commit counts; deployers that
    # re-check with the real query count opt out of the n=1 pre-check.
    import warnings as _warnings

    from ksql_linq_spark.streaming.stateful import ensure_rocksdb_provider

    prov_key = "spark.sql.streaming.stateStore.providerClass"
    old_shards = spark.conf.get("spark.sql.shuffle.partitions")
    old_prov = spark.conf.get(prov_key, None)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "16")
        with _warnings.catch_warnings():
            _warnings.simplefilter("error")  # any warning would fail
            ensure_rocksdb_provider(spark, check_shards=False)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shards)
        if old_prov is None:
            try:
                spark.conf.unset(prov_key)
            except Exception:  # noqa: BLE001 — not set before
                pass
        else:
            spark.conf.set(prov_key, old_prov)
