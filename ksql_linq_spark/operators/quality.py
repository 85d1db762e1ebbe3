"""Row-level data-quality gate: declarative constraints → pass/fail
routing with machine-readable reasons.

The reference validates eagerly at model-build time (ModelCreating /
EntityModel validation, /root/reference/src/Core/Modeling — schema-level
only); a 100 TB ingest additionally needs ROW-level gates (the
Delta-expectations / Great-Expectations shape): every row either passes
all constraints or is routed to a quarantine side with the list of rules
it violated, so bad data never silently poisons downstream aggregates
and every drop is attributable.

Spark-first: each rule compiles to one boolean Column; the reasons
column is a ``filter(array(...))`` over (name, ok) structs — the whole
gate is a single projection fused into the scan (zero shuffles, zero
Python), and the good/bad split reuses one cached pass or two scan-fused
filters.  At scale, route ``bad`` to the DLQ sink (streaming/dlq.py) and
let ``good`` flow on — same topology as the consume path's error
routing.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One named constraint; ``cond`` must be a boolean Column that is
    True for PASSING rows.  NULL evaluates as a failure (three-valued
    logic would otherwise let null rows slip through every gate)."""

    name: str
    cond: Column


def not_null(col: str) -> Rule:
    return Rule(f"{col}_not_null", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Rule:
    return Rule(f"{col}_in_range", (F.col(col) >= lo) & (F.col(col) <= hi))


def one_of(col: str, values: list) -> Rule:
    return Rule(f"{col}_one_of", F.col(col).isin(values))


def matches(col: str, pattern: str) -> Rule:
    """Anchored regex match (rlike is unanchored by default — anchor
    explicitly so the rule reads as 'the whole value matches')."""
    return Rule(f"{col}_matches", F.col(col).rlike(f"^(?:{pattern})$"))


def expression(name: str, cond: Column) -> Rule:
    return Rule(name, cond)


def _ok(rule: Rule) -> Column:
    return F.coalesce(rule.cond.cast("boolean"), F.lit(False))


def validate(
    df: DataFrame,
    rules: list[Rule],
    reasons_col: str = "_violations",
) -> DataFrame:
    """Stamp every row with the array of rule names it violates (empty
    array = clean row).  One fused projection; rule conditions are
    evaluated once each."""
    if not rules:
        raise ValueError("validate() needs at least one rule")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    checks = F.array(
        *[
            F.struct(F.lit(r.name).alias("rule"), _ok(r).alias("ok"))
            for r in rules
        ]
    )
    reasons = F.transform(
        F.filter(checks, lambda c: ~c["ok"]), lambda c: c["rule"]
    )
    return df.withColumn(reasons_col, reasons)


def quality_gate(
    df: DataFrame,
    rules: list[Rule],
    reasons_col: str = "_violations",
) -> tuple[DataFrame, DataFrame]:
    """(good, bad): rows passing every rule, and quarantined rows with
    their violation list.  Both sides are scan-fused filters over the
    same validated projection — callers that consume both should
    ``.persist()`` the validated frame or land it once and filter at
    read."""
    v = validate(df, rules, reasons_col)
    good = v.filter(F.size(reasons_col) == 0).drop(reasons_col)
    bad = v.filter(F.size(reasons_col) > 0)
    return good, bad


def violation_summary(
    df: DataFrame,
    rules: list[Rule],
    reasons_col: str = "_violations",
) -> DataFrame:
    """(rule, n_violations, violation_rate) per rule — the audit table a
    curation run publishes.  One explode + groupBy on a tiny
    (rows × violated-rules) frame, plus a broadcast 1-row total."""
    v = validate(df, rules, reasons_col)
    total = v.agg(F.count(F.lit(1)).alias("_n"))
    ex = v.select(F.explode(reasons_col).alias("rule"))
    return (
        ex.groupBy("rule")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .crossJoin(F.broadcast(total))
        .select(
            "rule",
            "n_violations",
            (F.col("n_violations") / F.col("_n")).alias("violation_rate"),
        )
    )
