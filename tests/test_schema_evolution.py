"""Schema evolution / registry-style validation tests
(ksql_linq_spark/schema_evolution.py — DecimalSchemaValidator and
subject-compatibility parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from ksql_linq_spark.entity import Column, Entity
from ksql_linq_spark.schema_evolution import (
    compatibility,
    conform,
    diff_schemas,
    is_promotion,
    validate_entity,
)


def _st(*fields):
    return T.StructType([T.StructField(n, t, nullable) for n, t, nullable in fields])


def test_promotions():
    assert is_promotion(T.IntegerType(), T.LongType())
    assert is_promotion(T.FloatType(), T.DoubleType())
    assert is_promotion(T.TimestampNTZType(), T.TimestampType())
    assert is_promotion(T.DecimalType(10, 2), T.DecimalType(18, 2))
    assert is_promotion(T.DecimalType(10, 2), T.DecimalType(20, 4))
    assert not is_promotion(T.LongType(), T.IntegerType())
    assert not is_promotion(T.DecimalType(18, 2), T.DecimalType(18, 4))  # digits shrink
    assert not is_promotion(T.StringType(), T.LongType())


def test_diff_and_compatibility_modes():
    old = _st(("id", T.LongType(), False), ("v", T.IntegerType(), True),
              ("tag", T.StringType(), True))
    # add nullable + widen v -> BACKWARD ok; FORWARD broken (widen can't
    # be read back by the old reader)
    new = _st(("id", T.LongType(), False), ("v", T.LongType(), True),
              ("tag", T.StringType(), True), ("extra", T.StringType(), True))
    d = diff_schemas(old, new)
    assert [f.name for f in d.added] == ["extra"]
    assert d.promoted == [("v", T.IntegerType(), T.LongType())]
    assert not d.removed and not d.narrowed
    assert compatibility(old, new) == {"BACKWARD"}

    # drop a nullable column only -> both directions fine
    dropped = _st(("id", T.LongType(), False), ("v", T.IntegerType(), True))
    assert compatibility(old, dropped) == {"BACKWARD", "FORWARD"}

    # narrow a type: breaks BACKWARD (new int reader can't take old
    # longs) but keeps FORWARD (old long reader promotes new ints)
    narrowed = _st(("id", T.IntegerType(), False), ("v", T.IntegerType(), True),
                   ("tag", T.StringType(), True))
    assert compatibility(old, narrowed) == {"FORWARD"}

    # incompatible type change (string -> long) -> neither direction
    broken = _st(("id", T.LongType(), False), ("v", T.IntegerType(), True),
                 ("tag", T.LongType(), True))
    assert compatibility(old, broken) == set()

    # identical -> FULL
    assert compatibility(old, old) == {"BACKWARD", "FORWARD"}


def test_validate_entity_decimal_strict_and_relaxed():
    ent = Entity(
        "acct",
        [Column("k", "long", key_order=0), Column("bal", "decimal(18,2)")],
    )
    observed = _st(("k", T.LongType(), True), ("bal", T.DecimalType(20, 4), True))
    with pytest.raises(ValueError, match="DecimalPrecisionMismatch"):
        validate_entity(ent, observed, mode="strict")
    adopted, warnings = validate_entity(ent, observed, mode="relaxed")
    assert adopted.schema["bal"].dataType == T.DecimalType(20, 4)  # Override path
    assert any("DecimalPrecisionMismatch" in w for w in warnings)
    # matching schema is silent in strict mode
    ok = _st(("k", T.LongType(), True), ("bal", T.DecimalType(18, 2), True))
    _, w = validate_entity(ent, ok, mode="strict")
    assert w == []

    # a declared column absent from storage fails HARD in strict mode
    # (it would otherwise read back as all-NULL via the projection)
    missing = _st(("k", T.LongType(), True))
    with pytest.raises(ValueError, match="MissingColumn"):
        validate_entity(ent, missing, mode="strict")
    _, w = validate_entity(ent, missing, mode="relaxed")
    assert any("MissingColumn" in x for x in w)


def test_conform_promotes_fills_and_refuses(spark):
    df = spark.createDataFrame(
        [(1, 2, 3.5)], "id int, v int, x double"
    )
    target = _st(
        ("id", T.LongType(), False),      # promote int->long
        ("v", T.DoubleType(), True),      # promote int->double
        ("note", T.StringType(), True),   # missing nullable -> NULL
    )  # x dropped
    out = conform(df, target)
    assert [f.name for f in out.schema.fields] == ["id", "v", "note"]
    assert [f.dataType for f in out.schema.fields] == [
        T.LongType(), T.DoubleType(), T.StringType()
    ]
    r = out.first()
    assert (r["id"], r["v"], r["note"]) == (1, 2.0, None)

    with pytest.raises(ValueError, match="narrowing"):
        conform(df, _st(("v", T.ShortType(), True)))
    with pytest.raises(ValueError, match="non-nullable"):
        conform(df, _st(("absent", T.LongType(), False)))


def test_conform_ntz_ingest_path(spark):
    """The round-2 NTZ regression as an evolution case: an NTZ storage
    column conforms onto a TIMESTAMP target via promotion (never a
    silent pass-through)."""
    import datetime as dt

    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 2, 3, 4, 5),)],
        T.StructType([T.StructField("ts", T.TimestampNTZType(), True)]),
    )
    target = _st(("ts", T.TimestampType(), True))
    out = conform(df, target)
    assert out.schema["ts"].dataType == T.TimestampType()
    assert out.first()["ts"] == dt.datetime(2024, 1, 2, 3, 4, 5)


def test_register_entity_validates_at_startup(spark, tmp_path):
    """Context registration runs the registry-style validation: strict
    raises on a decimal mismatch with storage, relaxed adopts the
    observed precision into the registered entity and reports it."""
    from ksql_linq_spark.context import SparkKsqlContext

    p = str(tmp_path / "bal.parquet")
    spark.createDataFrame(
        [(1,)], "k long"
    ).selectExpr("k", "CAST(1.5 AS DECIMAL(20,4)) AS bal").write.parquet(p)

    ent = Entity("bal", [Column("k", "long", key_order=0),
                         Column("bal", "decimal(18,2)")])
    ctx = SparkKsqlContext(spark)
    with pytest.raises(ValueError, match="DecimalPrecisionMismatch"):
        ctx.register_entity(ent, path=p, validation="strict")
    warnings = ctx.register_entity(ent, path=p, validation="relaxed")
    assert any("DecimalPrecisionMismatch" in w for w in warnings)
    assert ctx.entity("bal").schema["bal"].dataType == T.DecimalType(20, 4)
    assert ctx.table("bal").schema["bal"].dataType == T.DecimalType(20, 4)


# ----------------------------------------------------------------------
# File-backed subject store (MappingRegistry.cs:46-257 /
# SchemaRegistryExtensions.RegisterSchemaIfNewAsync parity)
# ----------------------------------------------------------------------

def _record(*fields):
    return {"type": "record", "name": "t_value", "fields": list(fields)}


def test_subject_store_round_trip(tmp_path):
    """register -> evolve -> verify-against-stored, including the
    register-if-changed short-circuit and a rejected narrowing."""
    from ksql_linq_spark.schema_evolution import (
        IncompatibleSchemaError,
        SubjectStore,
        avro_compatibility,
    )

    store = SubjectStore(str(tmp_path / "registry"))
    v1 = _record(
        {"name": "id", "type": "long"},
        {"name": "price", "type": "double"},
    )
    reg, created = store.register("trades-value", v1)
    assert created and reg.version == 1 and reg.schema_id == 1

    # identical schema -> existing id, nothing new stored
    reg2, created2 = store.register("trades-value", v1)
    assert not created2 and reg2.schema_id == reg.schema_id
    assert store.versions("trades-value") == [1]

    # compatible evolution: add a defaulted nullable field, widen int->long
    v2 = _record(
        {"name": "id", "type": "long"},
        {"name": "price", "type": "double"},
        {"name": "venue", "type": ["null", "string"], "default": None},
    )
    assert avro_compatibility(v1, v2) == {"BACKWARD", "FORWARD"}
    reg3, created3 = store.register("trades-value", v2)
    assert created3 and reg3.version == 2 and reg3.schema_id == 2

    # persistence: a fresh store over the same dir sees the history
    store_b = SubjectStore(str(tmp_path / "registry"))
    assert store_b.versions("trades-value") == [1, 2]
    assert store_b.latest("trades-value").schema == v2

    # rejected narrowing: double -> int is not Avro-resolvable
    bad = _record(
        {"name": "id", "type": "long"},
        {"name": "price", "type": "int"},
        {"name": "venue", "type": ["null", "string"], "default": None},
    )
    with pytest.raises(IncompatibleSchemaError, match="narrowing"):
        store_b.register("trades-value", bad)
    assert store_b.versions("trades-value") == [1, 2]  # nothing stored

    # rejected under BACKWARD: required field added without default
    bad2 = _record(
        {"name": "id", "type": "long"},
        {"name": "price", "type": "double"},
        {"name": "venue", "type": ["null", "string"], "default": None},
        {"name": "region", "type": "string"},
    )
    with pytest.raises(IncompatibleSchemaError, match="without default"):
        store_b.register("trades-value", bad2)

    # FORWARD mode: dropping a defaulted field is fine; dropping a
    # defaultless one is not (the old reader cannot fill it)
    store_b.set_compatibility("FORWARD", "trades-value")
    v3 = _record(
        {"name": "id", "type": "long"},
        {"name": "price", "type": "double"},
    )
    _, created4 = store_b.register("trades-value", v3)
    assert created4
    with pytest.raises(IncompatibleSchemaError, match="FORWARD"):
        store_b.register(
            "trades-value", _record({"name": "id", "type": "long"})
        )

    # NONE disables the gate entirely
    store_b.set_compatibility("NONE", "trades-value")
    _, created5 = store_b.register(
        "trades-value", _record({"name": "id", "type": "string"})
    )
    assert created5


def test_subject_store_registers_context_subjects(tmp_path, spark):
    """Context-boot registration parity: every entity lands as
    `<entity>-key` / `<entity>-value` subjects (SchemaSubjects.cs), and
    re-registering the same context is a no-op version-wise."""
    from ksql_linq_spark.context import SparkKsqlContext
    from ksql_linq_spark.entity import Column, Entity
    from ksql_linq_spark.schema_evolution import SubjectStore

    ctx = SparkKsqlContext(spark)
    ctx._entities["trades"] = Entity(
        "trades",
        [
            Column("broker", "string", nullable=False, key_order=0),
            Column("ts", "timestamp", timestamp=True),
            Column("price", "decimal(18,4)"),
        ],
        topic="trades_topic",
    )
    store = SubjectStore(str(tmp_path / "registry"))
    regs = store.register_context(ctx)
    assert set(regs) == {"trades-key", "trades-value"}
    assert all(r.version == 1 for r in regs.values())
    regs2 = store.register_context(ctx)
    assert all(r.version == 1 for r in regs2.values())  # unchanged
    # decimal precision widening is a legal evolution of the value subject
    ctx._entities["trades"].columns[2] = Column("price", "decimal(20,4)")
    regs3 = store.register_context(ctx)
    assert regs3["trades-value"].version == 2
    assert regs3["trades-key"].version == 1


def test_subject_store_concurrent_registrations(tmp_path):
    """ADVICE r6: id allocation + version creation are read-modify-write
    across files — concurrent registrations must still mint unique
    global ids and distinct version files (flock-serialized)."""
    import threading

    from ksql_linq_spark.schema_evolution import SubjectStore

    store = SubjectStore(str(tmp_path / "registry"))
    n = 16
    results: list = [None] * n
    barrier = threading.Barrier(n)

    def worker(i: int) -> None:
        barrier.wait()
        schema = _record({"name": "id", "type": "long"})
        reg, created = store.register(f"subj-{i}-value", schema)
        results[i] = (reg.schema_id, created)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    ids = sorted(sid for sid, _ in results)
    assert ids == list(range(1, n + 1))  # unique AND gap-free
    assert all(created for _, created in results)
    assert len(store.subjects()) == n
