"""Consume API: ForEachAsync analog with retry + DLQ + error actions.

Reference semantics (SURVEY.md §2.8 C1-C5):
- ``EventSet<T>.ForEachAsync(action)``: per-record callback, retry policy
  (fixed backoff, max attempts), DLQ on exhaustion, commit handling
  (/root/reference/src/EntitySets/EventSet.cs:214-381,
   src/Core/Retry/RetryPolicy.cs:1-114).
- ``OnError(ErrorAction)``: Skip / Retry / DLQ per entity
  (/root/reference/src/Core/Abstractions/ErrorAction.cs).

Spark mapping: ``writeStream.foreachBatch`` drives the user callback;
Kafka offsets/manual commit collapse into Spark checkpointing (C5 no-op).
The DLQ is an append table fed with enveloped failures.
"""

from __future__ import annotations

import enum
import time
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .dlq import DLQ_SCHEMA, RateLimiter, envelope


class ErrorAction(enum.Enum):
    SKIP = "skip"
    RETRY = "retry"
    DLQ = "dlq"


class RetryPolicy:
    """Fixed-backoff retry (RetryPolicy.cs:1-114)."""

    def __init__(self, max_attempts: int = 3, backoff_seconds: float = 0.1):
        self.max_attempts = max_attempts
        self.backoff_seconds = backoff_seconds

    def run(self, fn: Callable[[], Any]) -> Any:
        last: BaseException | None = None
        for attempt in range(1, self.max_attempts + 1):
            try:
                return fn()
            except Exception as e:  # noqa: BLE001 — user callback boundary
                last = e
                if attempt < self.max_attempts:
                    time.sleep(self.backoff_seconds)
        assert last is not None
        raise last


class Consumer:
    """for_each(action) over a streaming DataFrame with error policy.

    DLQ rows are appended to ``dlq_path`` (parquet) — the S8 side-output.
    """

    def __init__(
        self,
        source_name: str,
        on_error: ErrorAction = ErrorAction.DLQ,
        retry: RetryPolicy | None = None,
        dlq_path: str | None = None,
        dlq_rate_limiter: RateLimiter | None = None,
    ):
        self.source_name = source_name
        self.on_error = on_error
        self.retry = retry or RetryPolicy()
        self.dlq_path = dlq_path
        self.rate_limiter = dlq_rate_limiter or RateLimiter()

    def _handle_failure(self, spark: SparkSession, batch_id: int, row, exc) -> None:
        if self.on_error == ErrorAction.SKIP:
            return
        if self.on_error == ErrorAction.RETRY:
            raise exc  # fail the batch -> Spark retries from checkpoint
        if self.dlq_path and self.rate_limiter.should_send():
            env = envelope(self.source_name, batch_id, row.asDict(), exc)
            spark.createDataFrame([env], DLQ_SCHEMA).write.mode("append").parquet(
                self.dlq_path
            )

    def for_each_batch(self, action: Callable[[Any], None]):
        """Returns a foreachBatch function wrapping ``action`` per row."""

        def fn(batch_df: DataFrame, batch_id: int) -> None:
            spark = batch_df.sparkSession
            for row in batch_df.toLocalIterator():
                try:
                    self.retry.run(lambda r=row: action(r))
                except Exception as e:  # noqa: BLE001
                    self._handle_failure(spark, batch_id, row, e)

        return fn

    def start(
        self,
        stream_df: DataFrame,
        action: Callable[[Any], None],
        checkpoint: str,
        query_name: str | None = None,
    ):
        """ForEachAsync: attach the consumer to a streaming DataFrame."""
        w = (
            stream_df.writeStream.foreachBatch(self.for_each_batch(action))
            .option("checkpointLocation", checkpoint)
        )
        if query_name:
            w = w.queryName(query_name)
        return w.start()
