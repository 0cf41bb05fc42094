"""Streaming observability — structured metrics via StreamingQueryListener.

The reference's only diagnostics are println calls inside the sink
(cassandra_sink.scala:21,26,39). The engine replaces that with the
listener API: per-micro-batch progress (input rate, processed rows,
batch duration, state-store size) captured as structured records — the
numbers an operator pages on at 100 TB (watermark lag, state growth,
batch duration vs trigger interval).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetrics:
    query_name: str
    batch_id: int
    num_input_rows: int
    duration_ms: int | None
    state_rows: int | None


@dataclass
class MetricsCollector(StreamingQueryListener):
    """Collects per-batch metrics for every streaming query on the
    session. Attach with ``spark.streams.addListener(collector)``;
    records accumulate in ``collector.batches`` (driver-side, bounded by
    micro-batch count — ship to a metrics sink in production)."""

    batches: list[BatchMetrics] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API names)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        state = p.get("stateOperators") or []
        self.batches.append(
            BatchMetrics(
                query_name=p.get("name") or p.get("id", "?"),
                batch_id=p.get("batchId", -1),
                num_input_rows=p.get("numInputRows", 0),
                duration_ms=(p.get("durationMs") or {}).get("triggerExecution"),
                # SUM over all stateful operators: a join+dedup query reports
                # several entries, and a leak in any of them must show
                state_rows=sum(op.get("numRowsTotal", 0) for op in state)
                if state
                else None,
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def total_input_rows(self, query_name: str) -> int:
        return sum(b.num_input_rows for b in self.batches if b.query_name == query_name)
