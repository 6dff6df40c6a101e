"""Stream observability (SURVEY §2.10 T5).

The reference ran a driver-side sleep loop re-reading the sink table every
30 s and diffing counts (``/root/reference/spark/SaveDelta.scala:166-255``) —
an O(table) scan per tick. Spark-first replacement: a
``StreamingQueryListener`` that accumulates the same metrics (rows/batch,
input & processed rows/s, cumulative rows) from progress events, costing
nothing on the data path.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class StreamStats:
    batches: int = 0
    total_rows: int = 0
    last_batch_rows: int = 0
    last_input_rps: float = 0.0
    last_processed_rps: float = 0.0
    by_query: dict[str, int] = field(default_factory=dict)
    #: latest df.observe() metric values per observation name — data-path
    #: quality counters (null counts, value sums) computed inside the query
    #: itself, surfaced per batch with zero extra scans.
    observed: dict[str, dict] = field(default_factory=dict)


class ProgressMonitor(StreamingQueryListener):
    """Accumulates per-batch metrics; read :attr:`stats` at any time."""

    def __init__(self) -> None:
        self.stats = StreamStats()
        self._lock = threading.Lock()

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        rows = int(p.numInputRows or 0)
        with self._lock:
            s = self.stats
            s.batches += 1
            s.total_rows += rows
            s.last_batch_rows = rows
            s.last_input_rps = float(p.inputRowsPerSecond or 0.0)
            s.last_processed_rps = float(p.processedRowsPerSecond or 0.0)
            name = p.name or p.id
            s.by_query[str(name)] = s.by_query.get(str(name), 0) + rows
            try:
                obs = dict(p.observedMetrics or {})
            except Exception:  # pragma: no cover - defensive: API surface varies
                obs = {}
            for obs_name, row in obs.items():
                s.observed[obs_name] = row.asDict() if hasattr(row, "asDict") else dict(row)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def attach_monitor(spark: SparkSession) -> ProgressMonitor:
    monitor = ProgressMonitor()
    spark.streams.addListener(monitor)
    return monitor


def reconcile(expected_rows: int, sink_count: int) -> dict[str, int | bool]:
    """T5 reconciliation (SaveDelta.scala:210-228): stream-in vs sink counts."""
    return {
        "expected": expected_rows,
        "in_sink": sink_count,
        "consistent": expected_rows == sink_count,
        "lag": expected_rows - sink_count,
    }
