"""Declarative entity/schema layer.

Mirrors the reference's POCO + attribute model (SURVEY.md §1):
- ``[KsqlTopic]``   -> Entity.topic            (/root/reference/src/Core/Attributes/KsqlTopicAttribute.cs:8-30)
- ``[KsqlKey(n)]``  -> Column(key_order=n)     (/root/reference/src/Core/Attributes/KsqlKeyAttribute.cs:7-14)
- ``[KsqlTimestamp]`` -> Column(timestamp=True) (/root/reference/src/Core/Abstractions/EntityModel.cs:59-62)
- ``[KsqlDecimal(p,s)]`` -> DecimalType(p, s)  (/root/reference/src/Core/Attributes/KsqlDecimalAttribute.cs:6-16)

The reference derives schemas by CLR reflection (PropertyMeta.FromProperty,
src/Core/Models/PropertyMeta.cs:26-45); here an Entity is declared with
explicit typed columns and compiles to a Spark ``StructType``.  Spark is a
superset of the reference's type system (arrays/structs/maps of any type
are allowed; the reference only allows MAP<STRING,STRING> and rejects
nested types — src/Query/Schema/KsqlTypeMapping.cs:37-71).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# canonical type-name -> Spark type mapping (KsqlTypeMapping.cs:37-71)
_TYPE_ALIASES: dict[str, T.DataType] = {
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "short": T.ShortType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "string": T.StringType(),
    "varchar": T.StringType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "bytes": T.BinaryType(),
    "binary": T.BinaryType(),
}

DEFAULT_DECIMAL_PRECISION = 18  # DecimalPrecisionConfig.cs:11
DEFAULT_DECIMAL_SCALE = 2


def resolve_type(t: str | T.DataType) -> T.DataType:
    if isinstance(t, T.DataType):
        return t
    name = t.strip().lower()
    if name in _TYPE_ALIASES:
        return _TYPE_ALIASES[name]
    if name.startswith("decimal"):
        if "(" in name:
            inner = name[name.index("(") + 1 : name.rindex(")")]
            p, s = (int(x) for x in inner.split(","))
            return T.DecimalType(p, s)
        return T.DecimalType(DEFAULT_DECIMAL_PRECISION, DEFAULT_DECIMAL_SCALE)
    # fall back to DDL parser for array<...>, map<...>, struct<...>
    return T._parse_datatype_string(t)


@dataclass
class Column:
    """One entity column ≙ one POCO property (PropertyMeta)."""

    name: str
    dtype: str | T.DataType
    nullable: bool = True
    key_order: int | None = None  # [KsqlKey(order)]
    timestamp: bool = False  # [KsqlTimestamp] — the event-time column
    ignore: bool = False  # [KsqlIgnore] — excluded from the wire schema
    #   (/root/reference/src/Core/Attributes/KsqlIgnoreAttribute.cs:5-11)

    @property
    def spark_type(self) -> T.DataType:
        return resolve_type(self.dtype)


@dataclass
class Entity:
    """Typed record schema bound to a named table/topic (EntityModel.cs:10-148)."""

    name: str
    columns: list[Column]
    topic: str | None = None  # [KsqlTopic("name")]; defaults to entity name
    partitions: int = 1
    replication_factor: int = 1
    is_table: bool = False  # [KsqlTable] — TABLE (keyed upsert) vs STREAM
    #   (/root/reference/src/Core/Attributes/KsqlTableAttribute.cs:5-8)
    extra: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.topic is None:
            self.topic = self.name
        seen: set[str] = set()
        for c in self.columns:
            if c.name in seen:
                raise ValueError(f"duplicate column {c.name!r} in entity {self.name!r}")
            seen.add(c.name)
        ts_cols = [c for c in self.columns if c.timestamp]
        if len(ts_cols) > 1:
            raise ValueError(f"entity {self.name!r}: more than one [KsqlTimestamp] column")
        if ts_cols and ts_cols[0].ignore:
            raise ValueError(
                f"entity {self.name!r}: the [KsqlTimestamp] column cannot be [KsqlIgnore]d"
            )
        if self.is_table and not self.key_columns:
            raise ValueError(
                f"entity {self.name!r}: a [KsqlTable] needs at least one [KsqlKey] "
                "column (keyed upsert semantics)"
            )

    @property
    def key_columns(self) -> list[str]:
        """Composite keys ordered by key_order (EntityModel.IsCompositeKey, :113-116)."""
        keyed = [c for c in self.columns if c.key_order is not None]
        return [c.name for c in sorted(keyed, key=lambda c: c.key_order)]

    @property
    def timestamp_column(self) -> str | None:
        for c in self.columns:
            if c.timestamp:
                return c.name
        return None

    @property
    def schema(self) -> T.StructType:
        """Wire schema: [KsqlIgnore]d columns are not serialized."""
        return T.StructType(
            [
                T.StructField(c.name, c.spark_type, c.nullable)
                for c in self.columns
                if not c.ignore
            ]
        )

    def rowtime(self):
        """ROWTIME pseudo-column (the [KsqlTimestamp] event-time column;
        ksqlDB's record-timestamp accessor)."""
        from pyspark.sql import functions as F

        if self.timestamp_column is None:
            raise ValueError(f"entity {self.name!r} has no [KsqlTimestamp] column")
        return F.col(self.timestamp_column)

    def rowkey(self):
        """ROWKEY pseudo-column: the key column, or a struct of the
        composite key in key_order."""
        from pyspark.sql import functions as F

        keys = self.key_columns
        if not keys:
            raise ValueError(f"entity {self.name!r} has no [KsqlKey] columns")
        if len(keys) == 1:
            return F.col(keys[0])
        return F.struct(*[F.col(k) for k in keys])

    @classmethod
    def from_schema(cls, name: str, schema: T.StructType, **kw) -> "Entity":
        cols = [Column(f.name, f.dataType, f.nullable) for f in schema.fields]
        return cls(name, cols, **kw)
