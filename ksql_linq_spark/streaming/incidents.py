"""Runtime incident/event bus over Structured Streaming (SURVEY §2.8).

Reference surface being re-expressed:

- ``IncidentBus`` — a process-wide pub/sub for runtime incidents with
  isolated subscriber dispatch
  (/root/reference/src/Incidents/IncidentBus.cs:11-19).
- ``RuntimeEventBus`` — typed runtime event fan-out
  (/root/reference/src/Events/RuntimeEventBus.cs).
- ``WindowAggregatorMetrics`` — late-drop / flush counters surfaced per
  window aggregator (/root/reference/src/Window/WindowAggregatorMetrics.cs).

Spark-first shape: Structured Streaming already *measures* everything the
reference's metric structs carry — ``numRowsDroppedByWatermark`` per
stateful operator, watermark position, batch durations, restart identity
(same query id, new runId) — in ``StreamingQueryProgress`` and the
``StreamingQueryListener`` lifecycle events.  This module does NOT rebuild
any measurement: a listener adapter turns those signals into typed
:class:`Incident` records on an :class:`IncidentBus`, and the bus is the
pluggable surface (like DlqGuard for data errors): handlers subscribe, a
bounded in-memory ring is the default sink so tests and pull-readers can
inspect recent incidents without wiring anything.

At scale the handler writes incidents to a topic/table; the bus itself
holds no per-row state — incident volume is O(batches + lifecycle
events), never O(rows).
"""

from __future__ import annotations

import json
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Any, Callable

__all__ = [
    "Incident",
    "IncidentBus",
    "IncidentListener",
    "attach_incident_listener",
]


@dataclass(frozen=True)
class Incident:
    """One runtime incident (IncidentBus.cs envelope: kind + source +
    details; wall-clock stamped at publish)."""

    kind: str  # late_drop | gap | restart | terminated | failed | misconfiguration
    query_id: str | None
    query_name: str | None = None
    batch_id: int | None = None
    details: dict = field(default_factory=dict)
    at: float = field(default_factory=time.time)


class IncidentBus:
    """Process-wide incident pub/sub with ISOLATED dispatch: one failing
    subscriber never blocks the others or the publisher (the reference
    bus swallows per-handler faults the same way, IncidentBus.cs:11-19).

    Keeps the last ``keep`` incidents in a ring for pull-readers
    (``recent()``) — the default sink when no handler is subscribed.
    """

    def __init__(self, keep: int = 1000) -> None:
        self._handlers: list[Callable[[Incident], None]] = []
        self._ring: deque[Incident] = deque(maxlen=keep)
        self._lock = threading.Lock()

    def subscribe(self, handler: Callable[[Incident], None]) -> None:
        with self._lock:
            self._handlers.append(handler)

    def publish(self, incident: Incident) -> None:
        with self._lock:
            self._ring.append(incident)
            handlers = list(self._handlers)
        for h in handlers:
            try:
                h(incident)
            except Exception:  # noqa: BLE001 — isolation is the contract
                pass

    def recent(self, kind: str | None = None) -> list[Incident]:
        with self._lock:
            items = list(self._ring)
        return [i for i in items if kind is None or i.kind == kind]

    def clear(self) -> None:
        with self._lock:
            self._ring.clear()


def _progress_dict(progress: Any) -> dict:
    if isinstance(progress, dict):
        return progress
    j = getattr(progress, "json", None)
    if isinstance(j, str):
        try:
            return json.loads(j)
        except ValueError:
            return {}
    return {}


def incidents_from_progress(
    progress: dict,
    prev_dropped: dict[str, int] | None = None,
) -> list[Incident]:
    """Derive incidents from ONE progress dict.

    - ``late_drop``: any stateful operator whose cumulative
      ``numRowsDroppedByWatermark`` advanced vs ``prev_dropped`` (keyed
      by operator index) — the WindowAggregatorMetrics late counter.
    ``prev_dropped`` is mutated in place so a caller/listener can feed
    successive batches.
    """
    out: list[Incident] = []
    prev = prev_dropped if prev_dropped is not None else {}
    qid = progress.get("id")
    name = progress.get("name")
    batch = progress.get("batchId")
    for idx, op in enumerate(progress.get("stateOperators") or []):
        dropped = int(op.get("numRowsDroppedByWatermark") or 0)
        key = f"{qid}:{idx}"
        delta = dropped - prev.get(key, 0)
        prev[key] = dropped
        if delta > 0:
            out.append(
                Incident(
                    kind="late_drop",
                    query_id=str(qid) if qid else None,
                    query_name=name,
                    batch_id=batch,
                    details={
                        "operator": op.get("operatorName", str(idx)),
                        "n_rows": delta,
                        "watermark": (progress.get("eventTime") or {}).get(
                            "watermark"
                        ),
                    },
                )
            )
    return out


class IncidentListener:
    """``StreamingQueryListener`` adapter publishing lifecycle + progress
    incidents to an :class:`IncidentBus`.

    - started again with a previously seen query id (new runId) →
      ``restart`` (checkpoint recovery — the cascade/gap-fill restart
      paths this round's soak tests exercise),
    - progress with advancing ``numRowsDroppedByWatermark`` →
      ``late_drop`` per operator,
    - terminated → ``terminated``, or ``failed`` when Spark reports an
      exception.

    Implemented by inheriting the real ``StreamingQueryListener`` when
    available (attach with :func:`attach_incident_listener`); the
    ``on_*`` methods also accept plain dicts so the scan logic is unit-
    testable without a live stream.
    """

    def __init__(self, bus: IncidentBus | None = None) -> None:
        self.bus = bus or IncidentBus()
        self._seen_ids: set[str] = set()
        self._dropped: dict[str, int] = {}

    # -- lifecycle (called by the pyspark listener shim below) --------
    def on_started(self, qid: str, run_id: str, name: str | None) -> None:
        if qid in self._seen_ids:
            self.bus.publish(
                Incident(
                    kind="restart",
                    query_id=qid,
                    query_name=name,
                    details={"run_id": run_id},
                )
            )
        self._seen_ids.add(qid)

    def on_progress(self, progress: Any) -> None:
        for inc in incidents_from_progress(_progress_dict(progress), self._dropped):
            self.bus.publish(inc)

    def on_terminated(
        self, qid: str, exception: str | None = None
    ) -> None:
        self.bus.publish(
            Incident(
                kind="failed" if exception else "terminated",
                query_id=qid,
                details={"exception": exception} if exception else {},
            )
        )


def attach_incident_listener(spark, bus: IncidentBus | None = None):
    """Build the pyspark ``StreamingQueryListener`` shim around an
    :class:`IncidentListener`, register it on ``spark.streams``, and
    return ``(core, shim)`` — call ``spark.streams.removeListener(shim)``
    when done.  Kept as a factory (not a module-level class) so importing
    this module never requires the streaming listener machinery."""
    from pyspark.sql.streaming import StreamingQueryListener

    core = IncidentListener(bus)

    class _Shim(StreamingQueryListener):
        def onQueryStarted(self, event):
            core.on_started(str(event.id), str(event.runId), event.name)

        def onQueryProgress(self, event):
            core.on_progress(event.progress)

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            core.on_terminated(str(event.id), event.exception)

    shim = _Shim()
    spark.streams.addListener(shim)
    return core, shim
