"""Schema evolution & registry-style validation.

The reference validates every entity against its Schema-Registry
subject at startup — decimal precision/scale strictly or relaxed with
override (/root/reference/src/SchemaRegistryTools/DecimalSchemaValidator.cs:13-37),
subject meta diffing (SchemaRegistryMetaProvider.cs), and hard failure
before any query runs (KsqlContext.Schema.cs).  The Spark-native analog
validates a DECLARED entity schema against the OBSERVED storage schema
(parquet footer / stream source) and classifies evolution the way Avro
compatibility modes do:

- :func:`diff_schemas` — added / removed / type-changed fields, with
  widening-awareness (int→long→double, decimal precision growth,
  TIMESTAMP_NTZ→TIMESTAMP are promotions, not breaks);
- :func:`compatibility` — which of BACKWARD / FORWARD a change
  preserves (Avro semantics mapped onto columnar tables: nullable adds
  and drops are compatible both ways, narrowing breaks both);
- :func:`validate_entity` — the DecimalSchemaValidator twin:
  ``strict`` raises on any precision/scale mismatch, ``relaxed``
  returns an entity with the observed precision adopted (the
  reference's Override path) plus the warning list;
- :func:`conform` — cast/select an incoming DataFrame onto a target
  schema: promote widenings, fill missing nullable columns with NULL,
  reject narrowings and missing non-nullables loudly.

Everything is metadata-only (no data pass) except :func:`conform`,
which is a single projection.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# widening chains: writing a value of type K can be read as any type
# appearing after K in a chain (standard Avro/SQL promotions)
_PROMOTIONS: dict[type, tuple[type, ...]] = {
    T.ByteType: (T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType),
    T.ShortType: (T.IntegerType, T.LongType, T.FloatType, T.DoubleType),
    T.IntegerType: (T.LongType, T.FloatType, T.DoubleType),
    T.LongType: (T.FloatType, T.DoubleType),
    T.FloatType: (T.DoubleType,),
    T.TimestampNTZType: (T.TimestampType,),
    T.DateType: (T.TimestampType, T.TimestampNTZType),
}


def is_promotion(src: T.DataType, dst: T.DataType) -> bool:
    """True when every ``src`` value is exactly representable as ``dst``."""
    if src == dst:
        return True
    if isinstance(src, T.DecimalType) and isinstance(dst, T.DecimalType):
        return (
            dst.scale >= src.scale
            and (dst.precision - dst.scale) >= (src.precision - src.scale)
        )
    return isinstance(dst, _PROMOTIONS.get(type(src), ()))


@dataclass
class SchemaDiff:
    added: list[T.StructField] = field(default_factory=list)    # only in new
    removed: list[T.StructField] = field(default_factory=list)  # only in old
    promoted: list[tuple[str, T.DataType, T.DataType]] = field(default_factory=list)
    narrowed: list[tuple[str, T.DataType, T.DataType]] = field(default_factory=list)

    @property
    def unchanged(self) -> bool:
        return not (self.added or self.removed or self.promoted or self.narrowed)


def diff_schemas(old: T.StructType, new: T.StructType) -> SchemaDiff:
    """Field-level diff old→new; type changes split into widening
    promotions vs narrowing breaks."""
    d = SchemaDiff()
    old_f = {f.name: f for f in old.fields}
    new_f = {f.name: f for f in new.fields}
    for name, f_new in new_f.items():
        if name not in old_f:
            d.added.append(f_new)
        else:
            t_old = old_f[name].dataType
            if t_old != f_new.dataType:
                if is_promotion(t_old, f_new.dataType):
                    d.promoted.append((name, t_old, f_new.dataType))
                else:
                    d.narrowed.append((name, t_old, f_new.dataType))
    for name, f_old in old_f.items():
        if name not in new_f:
            d.removed.append(f_old)
    return d


def compatibility(old: T.StructType, new: T.StructType) -> set[str]:
    """Avro-style modes the old→new change preserves.

    BACKWARD — a reader of ``new`` can read data written with ``old``:
    added fields must be nullable (read as NULL), removed fields are
    ignored, type changes must promote old→new.
    FORWARD — a reader of ``old`` can read data written with ``new``:
    added fields are ignored, removed fields must have been nullable,
    type changes must promote new→old.
    FULL = both.  Mirrors subject compatibility the reference delegates
    to the Schema Registry.
    """
    d = diff_schemas(old, new)
    changes = d.promoted + d.narrowed  # every type change, either direction
    modes: set[str] = set()
    if all(f.nullable for f in d.added) and all(
        is_promotion(t_old, t_new) for _, t_old, t_new in changes
    ):
        modes.add("BACKWARD")
    if all(f.nullable for f in d.removed) and all(
        is_promotion(t_new, t_old) for _, t_old, t_new in changes
    ):
        modes.add("FORWARD")
    return modes


def validate_entity(entity, observed: T.StructType, mode: str = "strict"):
    """DecimalSchemaValidator twin: compare the entity's declared
    decimal precision/scale (and all field types) against the observed
    storage schema.

    ``strict``: raise ValueError on any mismatch (the reference's
    ValidationMode.Strict throw, DecimalSchemaValidator.cs:30-31).
    ``relaxed``: adopt the OBSERVED precision/scale into a copy of the
    entity (the Override path, :34-36) and return (entity, warnings).
    """
    from .entity import Column, Entity  # local import to avoid cycle

    if mode not in ("strict", "relaxed"):
        raise ValueError(f"mode must be strict|relaxed, got {mode!r}")
    obs = {f.name: f.dataType for f in observed.fields}
    warnings: list[str] = []
    new_cols: list[Column] = []
    for c in entity.columns:
        declared = c.spark_type
        seen = obs.get(c.name)
        adopted = c
        if seen is None:
            msg = f"MissingColumn(entity={entity.name}, property={c.name})"
            # strict startup validation FAILS HARD on a declared column
            # absent from storage (reference KsqlContext.Schema /
            # DecimalSchemaValidator strict path) — otherwise the schema
            # projection would silently read it back as all-NULL
            if mode == "strict":
                raise ValueError(msg)
            warnings.append(msg)
        elif (
            isinstance(declared, T.DecimalType)
            and isinstance(seen, T.DecimalType)
            and (declared.precision, declared.scale) != (seen.precision, seen.scale)
        ):
            msg = (
                f"DecimalPrecisionMismatch(entity={entity.name}, property={c.name}, "
                f"declared={declared.precision},{declared.scale}, "
                f"storage={seen.precision},{seen.scale})"
            )
            if mode == "strict":
                raise ValueError(msg)
            warnings.append(msg)
            adopted = Column(
                c.name, seen, c.nullable, c.key_order, c.timestamp, c.ignore
            )
        elif seen is not None and seen != declared and not is_promotion(seen, declared):
            msg = (
                f"TypeMismatch(entity={entity.name}, property={c.name}, "
                f"declared={declared.simpleString()}, storage={seen.simpleString()})"
            )
            if mode == "strict":
                raise ValueError(msg)
            warnings.append(msg)
        new_cols.append(adopted)
    if mode == "strict":
        return entity, warnings
    return (
        Entity(
            entity.name,
            new_cols,
            topic=entity.topic,
            partitions=entity.partitions,
            replication_factor=entity.replication_factor,
            is_table=entity.is_table,
            extra=entity.extra,
        ),
        warnings,
    )


def conform(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project ``df`` onto ``target``: promote widenings, add missing
    NULLABLE columns as typed NULLs, drop extras, preserve target column
    order.  Raises on narrowing casts and on missing non-nullable
    columns — silent coercion is how bad data poisons a corpus."""
    have = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name not in have:
            if not f.nullable:
                raise ValueError(f"conform: missing non-nullable column {f.name!r}")
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        else:
            src = have[f.name]
            if src == f.dataType:
                cols.append(F.col(f.name))
            elif is_promotion(src, f.dataType):
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                raise ValueError(
                    f"conform: narrowing {f.name!r} "
                    f"{src.simpleString()} -> {f.dataType.simpleString()} refused"
                )
    return df.select(*cols)
