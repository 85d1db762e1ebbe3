"""Design-time export tests (ScriptCommand/AvroCommand parity)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from ksql_linq_spark.context import SparkKsqlContext
from ksql_linq_spark.entity import Column, Entity
from ksql_linq_spark.script import (
    avro_key_schema,
    avro_value_schema,
    create_table_ddl,
    ddl_script,
)


def _entity():
    return Entity(
        "trades",
        [
            Column("broker", "string", nullable=False, key_order=0),
            Column("symbol", "string", nullable=False, key_order=1),
            Column("ts", "timestamp", timestamp=True),
            Column("price", "decimal(18,4)"),
            Column("qty", "long"),
        ],
        topic="trades_topic",
        partitions=3,
    )


def test_create_table_ddl_is_executable(spark):
    loc = tempfile.mkdtemp(prefix="ddl_")
    # a temp view named "trades" (left by other tests) would shadow the
    # catalog table for SHOW TBLPROPERTIES / spark.table resolution
    spark.catalog.dropTempView("trades")
    try:
        ddl = create_table_ddl(_entity(), location=loc)
        spark.sql(ddl)
        props = {
            r["key"]: r["value"]
            for r in spark.sql("SHOW TBLPROPERTIES trades").collect()
        }
        assert props["ksql.key.columns"] == "broker,symbol"
        assert props["ksql.timestamp.column"] == "ts"
        assert props["ksql.topic"] == "trades_topic"
        assert dict(spark.table("trades").dtypes)["price"] == "decimal(18,4)"
    finally:
        spark.sql("DROP TABLE IF EXISTS trades")
        shutil.rmtree(loc, ignore_errors=True)


def test_avro_schemas():
    ent = _entity()
    key = avro_key_schema(ent)
    # composite key in [KsqlKey] order, non-nullable
    assert [f["name"] for f in key["fields"]] == ["broker", "symbol"]
    assert all(f["type"] == "string" for f in key["fields"])
    val = avro_value_schema(ent)
    by_name = {f["name"]: f for f in val["fields"]}
    assert by_name["ts"]["type"] == ["null", {"type": "long", "logicalType": "timestamp-millis"}]
    assert by_name["price"]["type"][1]["logicalType"] == "decimal"
    assert by_name["price"]["type"][1]["precision"] == 18
    assert by_name["broker"]["type"] == "string"  # NOT NULL -> no union
    assert by_name["qty"]["default"] is None


def test_ddl_script_includes_derived_plan(spark, sf_dir):
    ctx = SparkKsqlContext(spark)
    ctx.register_parquet_dir(sf_dir)
    ctx._entities["trades"] = _entity()
    ctx.to_query(
        "totals",
        lambda c: c.from_("events")
        .group_by("event_type")
        .select(F.count(F.lit(1)).alias("n")),
    )
    text = ddl_script(ctx)
    assert "CREATE TABLE IF NOT EXISTS trades" in text
    assert "DERIVED ENTITY totals" in text
    assert "Aggregate" in text  # analyzed plan made it into the comment block


def test_query_registration_rotation_failed_then_unscored_first(tmp_path, monkeypatch):
    """queries() must order (1) queries whose latest scoring FAILED,
    then (2) never-scored queries, then (3) green ones oldest-round
    first — so a driver that scores only the first N re-verifies every
    fix and reaches every query across rounds."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as m

    seen = m._scoring_history()
    order = list(m.queries())
    all_names = set(m.oracle_sql())
    # every registered query is present exactly once
    assert set(order) >= all_names and len(order) == len(set(order))

    def tier(n):
        if n in seen:
            rnd, ok = seen[n]
            return (2, rnd) if ok else (0, rnd)
        return (1, -1)

    tiers = [tier(n) for n in order]
    assert tiers == sorted(tiers), (
        "rotation must be failed-last-scoring, then never-scored, "
        "then least-recently-scored"
    )


def test_cli_ai_assist_prints_guide(tmp_path):
    """CLI parity with the reference's `ai-assist` (AiAssistCommand.cs:
    prints the library-embedded assistant guide)."""
    import subprocess
    import sys as _sys

    out = subprocess.run(
        [_sys.executable, "tools/ddl_export.py", "ai-assist"],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    ).stdout
    assert "AI Assistant Guide" in out
    assert "staged fluent builder" in out

    dst = tmp_path / "guide.md"
    subprocess.run(
        [_sys.executable, "tools/ddl_export.py", "ai-assist", "-o", str(dst)],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    assert "verify in the user's own Spark environment" in dst.read_text()
