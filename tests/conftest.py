from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksql_linq_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = build_session("tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_CHANGELOG_KEY = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)
_HDFS_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)
_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


@pytest.fixture(params=["hdfs", "rocksdb_cl"])
def state_store(spark, request):
    """Run a stateful-kernel test under BOTH state-store providers
    (r11, VERDICT r10 item 4): the suite historically exercised only
    the HDFSBacked default, while the production-recommended store
    (RocksDB + changelog checkpointing, ensure_rocksdb_provider) was
    covered only by throughput probes.  Streaming confs are captured
    per-query at start, so setting the session conf here (and
    restoring after) is sufficient — every parameterized test starts
    its queries from fresh checkpoints."""
    old = {k: spark.conf.get(k, None) for k in (_PROVIDER_KEY, _CHANGELOG_KEY)}
    if request.param == "rocksdb_cl":
        spark.conf.set(_PROVIDER_KEY, _ROCKSDB_PROVIDER)
        spark.conf.set(_CHANGELOG_KEY, "true")
    else:
        # HDFSBacked is the Spark default; set it explicitly so the
        # leg is self-describing even if a prior test leaked conf
        spark.conf.set(_PROVIDER_KEY, _HDFS_PROVIDER)
        try:
            spark.conf.unset(_CHANGELOG_KEY)
        except Exception:  # noqa: BLE001 — not set
            pass
    yield request.param
    for k, v in old.items():
        if v is None:
            try:
                spark.conf.unset(k)
            except Exception:  # noqa: BLE001 — not set before either
                pass
        else:
            spark.conf.set(k, v)
