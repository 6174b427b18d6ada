"""Span-shaped tracing — the reference's OpenTelemetry surface (A15).

Reference: ``internal/tracing/tracing.go:19-61`` builds an OTLP/HTTP
exporter + batch processor with a ``service.name`` resource, and the
pipelines start spans ``generateEvent`` (``cmd/root.go:130``),
``cdc.message`` (``internal/ingestion/cdc.go:58``) and
``clickhouse.post`` (``internal/ingestion/clickhouse.go:28``); logs
are trace-id-prefixed (``internal/logging/logging.go:9-12``).

This module keeps the same span names and shape on Spark's execution
model: one span per *micro-batch* stage rather than per row — the
reference traces each row because it processes one row at a time; a
Spark trace of 10k per-row spans would be noise, so the batch is the
unit of work and the row count is a span attribute.  If the OTel
Python SDK is installed, ``Tracer`` mirrors every finished span into
it (import-gated — the SDK is not in this container).
"""

from __future__ import annotations

import json
import threading
import time
import uuid
from collections import deque
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener

#: Span names, matching the reference call sites exactly.
SPAN_GENERATE = "generateEvent"  # cmd/root.go:130
SPAN_CDC_MESSAGE = "cdc.message"  # internal/ingestion/cdc.go:58
SPAN_CLICKHOUSE_POST = "clickhouse.post"  # internal/ingestion/clickhouse.go:28


@dataclass
class Span:
    """One finished span (OTel-shaped: ids, bounds, attributes)."""

    name: str
    trace_id: str
    span_id: str
    parent_id: str | None
    start_ns: int
    end_ns: int = 0
    attributes: dict = field(default_factory=dict)

    @property
    def duration_ms(self) -> float:
        return (self.end_ns - self.start_ns) / 1e6

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "trace_id": self.trace_id,
            "span_id": self.span_id,
            "parent_id": self.parent_id,
            "start_ns": self.start_ns,
            "end_ns": self.end_ns,
            "duration_ms": round(self.duration_ms, 3),
            "attributes": self.attributes,
        }


class Tracer:
    """In-process tracer with the reference's Init(serviceName) shape
    (``tracing.go:19-51``): a service-name resource, a bounded buffer
    standing in for the batch processor, and optional OTel SDK export.

    Thread-safe: foreachBatch callbacks and the listener bus record
    spans concurrently."""

    def __init__(self, service_name: str = "ingestion-service", capacity: int = 10_000):
        self.service_name = service_name
        self._lock = threading.Lock()
        self._spans: deque[Span] = deque(maxlen=capacity)
        self._otel = self._try_otel()

    @staticmethod
    def _try_otel():
        try:  # pragma: no cover - SDK absent in this container
            from opentelemetry import trace as ot

            return ot.get_tracer(__name__)
        except Exception:
            return None

    @contextmanager
    def span(self, name: str, parent: Span | None = None, **attributes):
        """Start/finish one span around a block.  Errors are recorded
        as an ``error`` attribute and re-raised (the reference logs and
        continues at the call site — error policy stays with callers)."""
        s = Span(
            name=name,
            trace_id=parent.trace_id if parent else uuid.uuid4().hex,
            span_id=uuid.uuid4().hex[:16],
            parent_id=parent.span_id if parent else None,
            start_ns=time.time_ns(),
            attributes={"service.name": self.service_name, **attributes},
        )
        try:
            yield s
        except Exception as exc:
            s.attributes["error"] = repr(exc)
            raise
        finally:
            s.end_ns = time.time_ns()
            with self._lock:
                self._spans.append(s)
            if self._otel is not None:  # pragma: no cover
                with self._otel.start_as_current_span(name) as os_:
                    for k, v in s.attributes.items():
                        os_.set_attribute(k, str(v))

    def spans(self, name: str | None = None) -> list[Span]:
        with self._lock:
            out = list(self._spans)
        return [s for s in out if name is None or s.name == name]

    def to_jsonl(self) -> str:
        return "\n".join(json.dumps(s.to_dict()) for s in self.spans())

    def log_prefix(self, span: Span) -> str:
        """Trace-correlated log prefix, mirroring
        ``internal/logging/logging.go:9-12`` ("[trace_id] msg")."""
        return f"[{span.trace_id}]"


class SpanEmittingListener(StreamingQueryListener):
    """Emits one pipeline-stage span per micro-batch from streaming
    progress events: queries named ``synthetic*`` get ``generateEvent``
    spans, ``cdc*`` get ``cdc.message`` — the same stage names the
    reference starts per unit of work, at Spark's batch granularity."""

    def __init__(self, tracer: Tracer):
        self._tracer = tracer

    @staticmethod
    def _span_name(query_name: str | None) -> str:
        q = (query_name or "").lower()
        if q.startswith("cdc"):
            return SPAN_CDC_MESSAGE
        return SPAN_GENERATE

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        dur_ms = p.batchDuration or 0
        end = time.time_ns()
        name = self._span_name(p.name)
        with self._tracer.span(
            name,
            batch_id=p.batchId,
            rows=p.numInputRows or 0,
            query_id=str(p.id),
        ) as s:
            # back-date the span to cover the actual batch execution
            s.start_ns = end - int(dur_ms * 1e6)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
