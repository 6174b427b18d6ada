"""Pipeline metrics — the reference's Prometheus surface (A14) on
Spark's listener machinery.

Reference collectors (``internal/metrics/metrics.go:11-38``):

- ``ingestion_generated_events_total``        (counter)
- ``ingestion_clickhouse_rows_inserted_total`` (counter)
- ``ingestion_clickhouse_insert_errors_total`` (counter)
- ``ingestion_clickhouse_insert_latency_seconds`` (histogram)

Spark mapping: a ``StreamingQueryListener`` accumulates the same four
series from ``QueryProgressEvent`` — input rows -> generated, sink
rows -> inserted, batch durations -> latency histogram samples,
``onQueryTerminated`` with exception -> errors.  ``render()`` emits
Prometheus text exposition, so an HTTP /metrics endpoint (the
reference serves one, ``metrics.go:48-56``) just returns that string.
"""

from __future__ import annotations

import threading
from collections import defaultdict

from pyspark.sql.streaming import StreamingQueryListener

#: Prometheus DefBuckets (metrics.go:21 uses prometheus.DefBuckets).
DEF_BUCKETS = (0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)


class IngestionMetricsListener(StreamingQueryListener):
    """Accumulates the reference's four metric series from streaming
    progress events.  Thread-safe: listener callbacks arrive on Spark's
    listener bus thread."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.generated_events_total = 0
        self.rows_inserted_total = 0
        self.insert_errors_total = 0
        self.latency_bucket_counts: dict[float, int] = defaultdict(int)
        self.latency_sum = 0.0
        self.latency_count = 0

    # -- StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        rows = p.numInputRows or 0
        batch_s = ((p.batchDuration or 0)) / 1000.0
        with self._lock:
            self.generated_events_total += rows
            self.rows_inserted_total += rows  # sink rows == input rows here
            self.latency_sum += batch_s
            self.latency_count += 1
            for b in DEF_BUCKETS:
                if batch_s <= b:
                    self.latency_bucket_counts[b] += 1

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        if getattr(event, "exception", None):
            with self._lock:
                self.insert_errors_total += 1

    # -- Prometheus text exposition ---------------------------------------
    def render(self) -> str:
        """The /metrics payload (Prometheus text format), name-compatible
        with the reference's collectors."""
        with self._lock:
            lines = [
                "# TYPE ingestion_generated_events_total counter",
                f"ingestion_generated_events_total {self.generated_events_total}",
                "# TYPE ingestion_clickhouse_rows_inserted_total counter",
                f"ingestion_clickhouse_rows_inserted_total {self.rows_inserted_total}",
                "# TYPE ingestion_clickhouse_insert_errors_total counter",
                f"ingestion_clickhouse_insert_errors_total {self.insert_errors_total}",
                "# TYPE ingestion_clickhouse_insert_latency_seconds histogram",
            ]
            cumulative = 0
            for b in DEF_BUCKETS:
                cumulative += self.latency_bucket_counts.get(b, 0)
                lines.append(
                    f'ingestion_clickhouse_insert_latency_seconds_bucket{{le="{b}"}} {cumulative}'
                )
            lines += [
                f'ingestion_clickhouse_insert_latency_seconds_bucket{{le="+Inf"}} {self.latency_count}',
                f"ingestion_clickhouse_insert_latency_seconds_sum {self.latency_sum}",
                f"ingestion_clickhouse_insert_latency_seconds_count {self.latency_count}",
            ]
        return "\n".join(lines) + "\n"
