"""DLQ (dead-letter queue) envelope + rate-limited side-output.

Mirrors the reference's DlqEnvelope
(/root/reference/src/Messaging/DlqEnvelope.cs:6-31: topic/partition/offset
provenance keys, error fingerprint, headers) and DlqGuard rate limiting
(/root/reference/src/Core/Dlq/DlqGuard.cs:8,
src/Core/Dlq/SimpleRateLimiter.cs:1-31).

On Spark the DLQ is an append-only table written from inside
``foreachBatch``: provenance = (source, batch_id, row payload as JSON),
error fingerprint = sha256 of "type:message" like the reference's
fingerprinting.
"""

from __future__ import annotations

import hashlib
import json
import threading
import time
from dataclasses import dataclass

from pyspark.sql import types as T

DLQ_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("batch_id", T.LongType(), True),
        T.StructField("payload_json", T.StringType(), True),
        T.StructField("error_type", T.StringType(), True),
        T.StructField("error_message", T.StringType(), True),
        T.StructField("error_fingerprint", T.StringType(), True),
        T.StructField("occurred_at", T.TimestampType(), True),
    ]
)


def error_fingerprint(exc: BaseException) -> str:
    """Stable fingerprint: sha256 of 'ExcType:message' (reference:
    DlqEnvelopeFactory error fingerprinting)."""
    raw = f"{type(exc).__name__}:{exc}"
    return hashlib.sha256(raw.encode()).hexdigest()[:16]


def envelope(source: str, batch_id: int | None, payload, exc: BaseException) -> dict:
    import datetime as dt

    return {
        "source": source,
        "batch_id": batch_id,
        "payload_json": json.dumps(payload, default=str),
        "error_type": type(exc).__name__,
        "error_message": str(exc)[:2000],
        "error_fingerprint": error_fingerprint(exc),
        "occurred_at": dt.datetime.now(dt.timezone.utc).replace(tzinfo=None),
    }


@dataclass
class RateLimiter:
    """SimpleRateLimiter twin: at most ``max_per_window`` sends per window."""

    max_per_window: int = 100
    window_seconds: float = 60.0

    def __post_init__(self):
        self._lock = threading.Lock()
        self._window_start = time.monotonic()
        self._count = 0

    def should_send(self) -> bool:  # DlqGuard.ShouldSend
        with self._lock:
            now = time.monotonic()
            if now - self._window_start >= self.window_seconds:
                self._window_start = now
                self._count = 0
            if self._count < self.max_per_window:
                self._count += 1
                return True
            return False
