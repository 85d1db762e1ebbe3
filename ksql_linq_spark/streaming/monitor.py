"""Lag / heartbeat monitoring over Structured Streaming progress (SURVEY §2.8 C8).

Reference surface being re-expressed:

- ``LagMonitor.GetGroupLagAsync`` -> ``LagSnapshot {SumLag, MaxLag}``
  (/root/reference/src/Infrastructure/Monitoring/LagMonitor.cs:12-16) — consumer-group
  backlog per topic-partition, summed and maxed.
- ``RowMonitor`` heartbeat logs: per-flush reason (grace vs timer) and
  interval stats (/root/reference/src/Runtime/RowMonitor.cs:791-819).

Spark already tracks all of this per micro-batch in
``StreamingQuery.lastProgress``: Kafka sources report ``endOffset`` (processed)
vs ``latestOffset`` (broker head) per partition, and the progress carries
watermark, state-store rows, and batch durations.  This module only reshapes
that into the reference's snapshot/heartbeat vocabulary — no polling
machinery is rebuilt (checkpoints subsume offset bookkeeping, SURVEY §3.2).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any


@dataclass(frozen=True)
class LagSnapshot:
    """Parity with LagMonitor.LagSnapshot: total and worst-partition backlog."""

    sum_lag: int
    max_lag: int


def _offsets(raw: Any) -> dict[tuple[str, str], int]:
    """Flatten a progress offset field ({topic: {partition: offset}} — Kafka
    shape; JSON string or dict) into {(topic, partition): offset}."""
    if raw is None:
        return {}
    if isinstance(raw, str):
        try:
            raw = json.loads(raw)
        except (ValueError, TypeError):
            return {}
    if not isinstance(raw, dict):
        return {}
    out: dict[tuple[str, str], int] = {}
    for topic, parts in raw.items():
        if isinstance(parts, dict):
            for part, off in parts.items():
                if isinstance(off, (int, float)):
                    out[(str(topic), str(part))] = int(off)
    return out


def lag_snapshot(progress: dict | None) -> LagSnapshot:
    """Backlog from one progress dict: latestOffset - endOffset per
    partition, clamped at 0 (same clamp as LagMonitor.cs:52-55).  Sources
    without broker-head reporting (files, rate) contribute 0."""
    if not progress:
        return LagSnapshot(0, 0)
    sum_lag = 0
    max_lag = 0
    for src in progress.get("sources") or []:
        end = _offsets(src.get("endOffset"))
        latest = _offsets(src.get("latestOffset"))
        for tp, head in latest.items():
            lag = max(0, head - end.get(tp, 0))
            sum_lag += lag
            max_lag = max(max_lag, lag)
    return LagSnapshot(sum_lag, max_lag)


def heartbeat(progress: dict | None) -> dict[str, Any]:
    """RowMonitor-style heartbeat line from one progress dict: batch id,
    rows, rates, watermark, state rows, and how long the trigger took."""
    if not progress:
        return {"alive": False}
    state = (progress.get("stateOperators") or [{}])[0]
    return {
        "alive": True,
        "batch_id": progress.get("batchId"),
        "num_input_rows": progress.get("numInputRows", 0),
        "input_rows_per_second": progress.get("inputRowsPerSecond", 0.0),
        "watermark": (progress.get("eventTime") or {}).get("watermark"),
        "state_rows": state.get("numRowsTotal", 0),
        "rows_dropped_by_watermark": state.get("numRowsDroppedByWatermark", 0),
        "trigger_ms": (progress.get("durationMs") or {}).get("triggerExecution"),
    }


class QueryMonitor:
    """Attach to a running StreamingQuery; expose snapshot()/heartbeat().

    ``flush_reason`` mirrors RowMonitor.DetermineFlushReason: a window
    emitted because the watermark passed its end is a "grace" flush, an
    update-mode emission on a timer tick is a "timer" flush — in Spark
    terms, append-mode output is always watermark-driven, update-mode is
    trigger-driven.
    """

    def __init__(self, query) -> None:
        self.query = query
        self._dropped: dict[str, int] = {}

    def _progress(self) -> dict | None:
        p = self.query.lastProgress
        if p is None:
            return None
        return p if isinstance(p, dict) else json.loads(p.json)

    def snapshot(self) -> LagSnapshot:
        return lag_snapshot(self._progress())

    def heartbeat(self) -> dict[str, Any]:
        hb = heartbeat(self._progress())
        hb["query_id"] = str(self.query.id)
        hb["is_active"] = self.query.isActive
        return hb

    def flush_reason(self, output_mode: str) -> str:
        return "grace" if output_mode == "append" else "timer"

    def publish_incidents(self, bus) -> list:
        """Pull-mode twin of incidents.IncidentListener: scan the
        query's latest progress for incident signals (late-drop counter
        deltas) and publish them to ``bus`` (incidents.IncidentBus).
        Returns the incidents published this call.  Use the listener
        for push delivery; use this from a polling loop that already
        holds the query handle."""
        from .incidents import incidents_from_progress

        p = self._progress()
        if not p:
            return []
        found = incidents_from_progress(p, self._dropped)
        for inc in found:
            bus.publish(inc)
        return found
