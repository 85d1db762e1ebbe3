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


# ======================================================================
# File-backed Schema-Registry subject store
# ======================================================================
#
# The reference registers each entity's key/value Avro schemas as
# Registry subjects and lets the server enforce subject compatibility on
# every new version (src/Mapping/MappingRegistry.cs:46-257 builds the
# schemas; src/SchemaRegistryTools/SchemaRegistryExtensions.cs
# RegisterSchemaIfNewAsync implements register-if-changed;
# SchemaSubjects.cs fixes the `<topic>-key`/`<topic>-value` naming that
# ksql_linq_spark.script.avro_export mirrors).  SubjectStore is that
# lifecycle against a directory instead of a server: register -> evolve
# -> compatibility-verify, with the same outcomes (identical schema
# returns the existing id; an incompatible evolution is refused before
# anything is stored).

import fcntl as _fcntl
import json as _json
import os as _os
import re as _re
from contextlib import contextmanager as _contextmanager
from dataclasses import dataclass as _dataclass

# Avro schema-resolution promotions (Avro spec "Schema Resolution"):
# data written as K is readable as any type in _AVRO_PROMOTIONS[K]
_AVRO_PROMOTIONS: dict[str, set[str]] = {
    "int": {"long", "float", "double"},
    "long": {"float", "double"},
    "float": {"double"},
    "string": {"bytes"},
    "bytes": {"string"},
}


class IncompatibleSchemaError(Exception):
    """409-analog: the proposed schema violates the subject's
    compatibility mode; nothing was registered."""


def _is_union(t) -> bool:
    return isinstance(t, list)


def _nullable(t) -> bool:
    return _is_union(t) and "null" in t


def _union_base(t):
    branches = [b for b in t if b != "null"]
    if len(branches) != 1:
        raise ValueError(f"only null-unions are supported, got {t!r}")
    return branches[0]


def _type_name(t) -> str:
    return t["type"] if isinstance(t, dict) else t


def _avro_readable(writer, reader) -> bool:
    """Can data written with ``writer`` be read with ``reader``?"""
    if writer == reader:
        return True
    if _is_union(writer):
        if "null" in writer and not _nullable(reader):
            return False  # a written null has nowhere to go
        return _avro_readable(_union_base(writer), reader)
    if _is_union(reader):
        return _avro_readable(writer, _union_base(reader))
    wn, rn = _type_name(writer), _type_name(reader)
    if isinstance(writer, dict) or isinstance(reader, dict):
        wd = writer if isinstance(writer, dict) else {"type": writer}
        rd = reader if isinstance(reader, dict) else {"type": reader}
        if wd.get("logicalType") == "decimal" or rd.get("logicalType") == "decimal":
            return (
                wd.get("logicalType") == rd.get("logicalType")
                and rd["scale"] >= wd["scale"]
                and rd["precision"] - rd["scale"] >= wd["precision"] - wd["scale"]
            )
        if wn == "array" and rn == "array":
            return _avro_readable(wd["items"], rd["items"])
        if wn == "map" and rn == "map":
            return _avro_readable(wd["values"], rd["values"])
        if wd.get("logicalType") != rd.get("logicalType"):
            return False
    return rn in _AVRO_PROMOTIONS.get(wn, set())


def _can_read(writer_schema: dict, reader_schema: dict, errors: list[str]) -> bool:
    """Record-level resolution: every reader field is either present in
    the writer with a readable type, or carries a default."""
    ok = True
    writer_fields = {f["name"]: f for f in writer_schema.get("fields", [])}
    for rf in reader_schema.get("fields", []):
        wf = writer_fields.get(rf["name"])
        if wf is None:
            if "default" not in rf:
                errors.append(
                    f"field {rf['name']!r} added without default "
                    "(reader cannot fill it for old data)"
                )
                ok = False
        elif not _avro_readable(wf["type"], rf["type"]):
            errors.append(
                f"field {rf['name']!r}: {wf['type']!r} is not readable as "
                f"{rf['type']!r} (narrowing)"
            )
            ok = False
    return ok


def avro_compatibility(old: dict, new: dict) -> set[str]:
    """Which of BACKWARD / FORWARD the old→new subject evolution
    preserves, per Avro schema-resolution rules (the server-side check
    the reference delegates to the Schema Registry)."""
    modes: set[str] = set()
    if _can_read(old, new, []):
        modes.add("BACKWARD")
    if _can_read(new, old, []):
        modes.add("FORWARD")
    return modes


@_dataclass(frozen=True)
class RegisteredSchema:
    subject: str
    version: int
    schema_id: int
    schema: dict


_VALID_MODES = {"BACKWARD", "FORWARD", "FULL", "NONE"}


class SubjectStore:
    """Directory-backed Schema-Registry subject lifecycle.

    Layout: ``<root>/<subject>/<version>.json`` holding the schema +
    global id; ``<root>/<subject>/config.json`` for a per-subject
    compatibility override; ``<root>/_ids.json`` for the monotonically
    increasing global schema id (Registry semantics: ids are global,
    versions are per-subject)."""

    def __init__(self, root: str, default_compatibility: str = "BACKWARD"):
        if default_compatibility not in _VALID_MODES:
            raise ValueError(f"unknown compatibility mode {default_compatibility!r}")
        self._root = root
        self._default = default_compatibility
        _os.makedirs(root, exist_ok=True)

    # -- helpers ---------------------------------------------------------
    def _dir(self, subject: str) -> str:
        if not _re.fullmatch(r"[A-Za-z0-9._\-]+", subject):
            raise ValueError(f"invalid subject name {subject!r}")
        return _os.path.join(self._root, subject)

    def _version_files(self, subject: str) -> list[tuple[int, str]]:
        d = self._dir(subject)
        if not _os.path.isdir(d):
            return []
        out = []
        for fn in _os.listdir(d):
            m = _re.fullmatch(r"(\d+)\.json", fn)
            if m:
                out.append((int(m.group(1)), _os.path.join(d, fn)))
        return sorted(out)

    @_contextmanager
    def _locked(self):
        """Exclusive advisory lock over the store — id allocation and
        version creation are read-modify-write across files, so two
        concurrent registrations could otherwise mint duplicate global
        ids or overwrite the same version file.  flock releases on
        process death (no stale-lock cleanup needed)."""
        p = _os.path.join(self._root, ".lock")
        with open(p, "w") as f:
            _fcntl.flock(f, _fcntl.LOCK_EX)
            try:
                yield
            finally:
                _fcntl.flock(f, _fcntl.LOCK_UN)

    def _next_id(self) -> int:
        # caller holds _locked()
        p = _os.path.join(self._root, "_ids.json")
        cur = 0
        if _os.path.exists(p):
            with open(p) as f:
                cur = _json.load(f)["max_id"]
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            _json.dump({"max_id": cur + 1}, f)
        _os.replace(tmp, p)
        return cur + 1

    @staticmethod
    def _canon(schema: dict) -> str:
        return _json.dumps(schema, sort_keys=True, separators=(",", ":"))

    # -- compatibility config -------------------------------------------
    def set_compatibility(self, mode: str, subject: str | None = None) -> None:
        if mode not in _VALID_MODES:
            raise ValueError(f"unknown compatibility mode {mode!r}")
        if subject is None:
            self._default = mode
            return
        d = self._dir(subject)
        _os.makedirs(d, exist_ok=True)
        with open(_os.path.join(d, "config.json"), "w") as f:
            _json.dump({"compatibility": mode}, f)

    def get_compatibility(self, subject: str) -> str:
        p = _os.path.join(self._dir(subject), "config.json")
        if _os.path.exists(p):
            with open(p) as f:
                return _json.load(f)["compatibility"]
        return self._default

    # -- lifecycle -------------------------------------------------------
    def subjects(self) -> list[str]:
        return sorted(
            s for s in _os.listdir(self._root)
            if _os.path.isdir(_os.path.join(self._root, s))
        )

    def versions(self, subject: str) -> list[int]:
        return [v for v, _ in self._version_files(subject)]

    def get(self, subject: str, version: int) -> RegisteredSchema:
        for v, p in self._version_files(subject):
            if v == version:
                with open(p) as f:
                    row = _json.load(f)
                return RegisteredSchema(subject, v, row["id"], row["schema"])
        raise KeyError(f"{subject} version {version} not found")

    def latest(self, subject: str) -> RegisteredSchema | None:
        vf = self._version_files(subject)
        return self.get(subject, vf[-1][0]) if vf else None

    def check(self, subject: str, schema: dict) -> list[str]:
        """Compatibility-verify WITHOUT registering (the Registry's
        POST /compatibility endpoint analog).  Empty list = compatible
        under the subject's mode."""
        latest = self.latest(subject)
        if latest is None:
            return []
        mode = self.get_compatibility(subject)
        errors: list[str] = []
        if mode in ("BACKWARD", "FULL"):
            errs: list[str] = []
            if not _can_read(latest.schema, schema, errs):
                errors += [f"BACKWARD: {e}" for e in errs]
        if mode in ("FORWARD", "FULL"):
            errs = []
            if not _can_read(schema, latest.schema, errs):
                errors += [f"FORWARD: {e}" for e in errs]
        return errors

    def register(self, subject: str, schema: dict) -> tuple[RegisteredSchema, bool]:
        """Register-if-changed (SchemaRegistryExtensions.cs:20-46):
        returns (registered, was_created).  An identical latest schema
        short-circuits to the stored id; an incompatible change raises
        IncompatibleSchemaError and stores nothing."""
        with self._locked():
            latest = self.latest(subject)
            if latest is not None and self._canon(latest.schema) == self._canon(schema):
                return latest, False
            errors = self.check(subject, schema)
            if errors:
                raise IncompatibleSchemaError(
                    f"subject {subject!r} mode {self.get_compatibility(subject)}: "
                    + "; ".join(errors)
                )
            d = self._dir(subject)
            _os.makedirs(d, exist_ok=True)
            version = (latest.version + 1) if latest else 1
            sid = self._next_id()
            vp = _os.path.join(d, f"{version}.json")
            tmp = vp + ".tmp"
            with open(tmp, "w") as f:
                _json.dump(
                    {"id": sid, "schema": schema, "version": version}, f, indent=2
                )
            _os.replace(tmp, vp)
            return RegisteredSchema(subject, version, sid, schema), True

    def register_context(self, ctx) -> dict[str, RegisteredSchema]:
        """Register every entity's key/value subjects (the context-boot
        registration MappingRegistry performs), via script.avro_export's
        `<entity>-key` / `<entity>-value` subject layout."""
        from .script import avro_export

        out: dict[str, RegisteredSchema] = {}
        for subject, schema in avro_export(ctx).items():
            out[subject], _ = self.register(subject, schema)
        return out
