"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
a deterministic synthetic events source, batch AND streaming.

The reference is at bottom a source→sink project (Kafka in,
cassandra_sink.scala:98-103); this module covers the modern PySpark
answer for "my source has no built-in connector": implement the
DataSource API once and both `spark.read.format(...)` and
`spark.readStream.format(...)` work against it, with Spark managing
partition planning, offset tracking and replay.

Design points (the parts that matter at scale):
- **Partitioned batch reads**: `partitions()` returns one InputPartition
  per row-range; executors call `read(partition)` in parallel — the
  driver never materializes rows.
- **Deterministic data**: rows derive from the row index via pure
  arithmetic (no RNG state), so a retried/speculated task regenerates
  IDENTICAL rows — the property that makes the source exactly-once
  replayable (same contract the parquet mirror gives the streaming
  tests).
- **Streaming offsets**: the stream reader advances a monotone row
  counter `{"offset": n}`; each micro-batch is the half-open row range
  [start, end) split into partitions. Offsets are JSON-serializable and
  replay-stable, so checkpoint recovery re-reads the exact same batch.
- **Arrow option**: `read()` may yield pyarrow RecordBatches instead of
  tuples for wide rows; tuples are fine at this row width.

Gated import: the API exists from Spark 4.0 — `register_synthetic_events`
raises a clear error on older runtimes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.types import StructType

try:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )

    PYSOURCE_AVAILABLE = True
except ImportError:  # pragma: no cover - pyspark < 4.0
    PYSOURCE_AVAILABLE = False
    DataSource = DataSourceReader = DataSourceStreamReader = object  # type: ignore

    class InputPartition:  # type: ignore
        def __init__(self, value):
            self.value = value


SCHEMA_DDL = (
    "event_id bigint, user_id bigint, event_type string, value double"
)
EVENT_TYPES = ["view", "click", "purchase", "error", "refund"]
_DEFAULT_ROWS = 1000
_DEFAULT_NPART = 4
_BATCH_ROWS_PER_TRIGGER = 50


def _row(i: int) -> tuple:
    """Pure function row-index -> row; the determinism contract."""
    # mix the index so consecutive rows don't share every field
    h = (i * 2654435761) % (1 << 32)
    return (
        i,
        h % 97,
        EVENT_TYPES[h % len(EVENT_TYPES)],
        round((h % 100_000) / 100.0, 2),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", _DEFAULT_ROWS))
        self.n_parts = int(options.get("partitions", _DEFAULT_NPART))

    def partitions(self):
        step = max(1, self.n_rows // self.n_parts)
        bounds = list(range(0, self.n_rows, step)) + [self.n_rows]
        return [
            _RangePartition(bounds[i], bounds[i + 1])
            for i in range(len(bounds) - 1)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)


class SyntheticEventsStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_trigger = int(
            options.get("rowsPerTrigger", _BATCH_ROWS_PER_TRIGGER)
        )
        self.max_rows = int(options.get("rows", _DEFAULT_ROWS))
        self.n_parts = int(options.get("partitions", _DEFAULT_NPART))
        # monotone cursor: the max over EVERY offset the engine has ever
        # handed us (initialOffset / partitions / commit) or we have
        # proposed. latestOffset never returns below it, so a restarted
        # driver can never propose an offset behind one it has seen —
        # the engine-plans-a-backward-batch behavior the first design
        # leaned on is engine-internal and not contractual.
        self._cur = 0

    def _seen(self, *offsets: int) -> None:
        self._cur = max(self._cur, *offsets)

    def initialOffset(self):
        self._seen(0)
        return {"offset": 0}

    def latestOffset(self):
        # advance by one trigger's worth, capped at the configured end —
        # a bounded stream so tests can drain it with processAllAvailable.
        # `_cur` is driver-memory only; after a checkpoint restart Spark
        # re-plans the last uncommitted batch via partitions(start, end)
        # BEFORE asking for a new latestOffset, so the cursor is re-seeded
        # from the restored offsets on the first engine call that carries
        # them; restart tests pin that no row is ever re-emitted, for both
        # drained and grown sources.
        nxt = min(self._cur + self.rows_per_trigger, self.max_rows)
        self._seen(nxt)
        return {"offset": nxt}

    def partitions(self, start, end):
        lo, hi = start["offset"], end["offset"]
        # seed with BOTH bounds: after a restart `lo` is the restored
        # committed offset (possibly > a stale latestOffset proposal)
        self._seen(lo, hi)
        step = max(1, (hi - lo) // self.n_parts or 1)
        bounds = list(range(lo, hi, step)) + [hi]
        return [
            _RangePartition(bounds[i], bounds[i + 1])
            for i in range(len(bounds) - 1)
            if bounds[i] < bounds[i + 1]
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)

    def commit(self, end):
        # offsets are self-describing row counts: nothing to clean up;
        # keep the cursor monotone across checkpoint recovery
        self._seen(end["offset"])


class SyntheticEventsSource(DataSource):
    """`format("synthetic_events")`: options rows, partitions,
    rowsPerTrigger (stream)."""

    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return SCHEMA_DDL

    def reader(self, schema: StructType):
        return SyntheticEventsReader(self.options)

    def streamReader(self, schema: StructType):
        return SyntheticEventsStreamReader(self.options)


def register_synthetic_events(spark) -> None:
    if not PYSOURCE_AVAILABLE:
        raise RuntimeError(
            "pyspark.sql.datasource requires Spark >= 4.0; "
            "use the parquet file mirror sources instead"
        )
    spark.dataSource.register(SyntheticEventsSource)


def expected_rows(n: int) -> list[tuple]:
    """Driver-side ground truth for tests."""
    return [_row(i) for i in range(n)]
