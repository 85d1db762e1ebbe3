"""KsqlContext analog — session + catalog + derived-query registry.

The reference's context boot (SURVEY.md §3.1) registers entity schemas,
emits DDL to ksqlDB and stabilizes persistent queries
(/root/reference/src/Context/KsqlContext.Lifecycle.cs:210-341).  On Spark
the same lifecycle collapses to: build a SparkSession, register each
entity as a catalog view over its storage, and start one checkpointed
streaming query per derived entity (handled in
:mod:`ksql_linq_spark.streaming`).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from .entity import Entity
from .query.builder import Query, from_df

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


class SparkKsqlContext:
    def __init__(self, spark: SparkSession, data_dir: str | None = None):
        self.spark = spark
        self.data_dir = data_dir
        self._entities: dict[str, Entity] = {}
        self._derived: dict[str, Callable[[SparkSession], DataFrame]] = {}

    # -- model building (OnModelCreating analog) -------------------------
    def register_entity(self, entity: Entity, path: str | None = None) -> None:
        """Entity<T>() — bind a schema to a storage location as a view."""
        self._entities[entity.name] = entity
        if path is None and self.data_dir is not None:
            path = os.path.join(self.data_dir, f"{entity.topic}.parquet")
        if path is not None and os.path.exists(path):
            df = self.spark.read.schema(entity.schema).parquet(path)
            df.createOrReplaceTempView(entity.name)

    def register_parquet_dir(self, data_dir: str, tables: list[str] | None = None) -> None:
        """Register every driver table in ``data_dir`` as a temp view."""
        self.data_dir = data_dir
        for name in tables or TABLES:
            p = os.path.join(data_dir, f"{name}.parquet")
            if os.path.exists(p):
                self.spark.read.parquet(p).createOrReplaceTempView(name)

    def to_query(self, name: str, fn: Callable[["SparkKsqlContext"], Query | DataFrame]) -> None:
        """ToQuery(...) — attach a derived entity defined by a query
        (EntityModel.QueryModel, /root/reference/src/Context/KsqlContext.Model.cs:202-368).
        Materialized as a temp view immediately (batch analog of CSAS/CTAS)."""
        out = fn(self)
        df = out.to_df() if isinstance(out, Query) else out
        df.createOrReplaceTempView(name)
        self._derived[name] = lambda spark: df

    # -- access ----------------------------------------------------------
    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def from_(self, name: str, strict: bool = True) -> Query:
        """From<T>() root."""
        return from_df(self.spark.table(name), name=name, strict=strict)

    def entity(self, name: str) -> Entity:
        return self._entities[name]


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Plain loader used by __spark_entry__ / bench: name -> DataFrame."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            out[name] = spark.read.parquet(p)
    return out
