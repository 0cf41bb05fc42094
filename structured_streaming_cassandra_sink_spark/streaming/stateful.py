"""Custom stateful streaming operator — applyInPandasWithState.

The reference's only stateful construct is the implicit upsert state its
Cassandra PK table carries (cassandra_sink.scala:71-79). This module is
the engine's escape hatch for state the built-in operators can't express
(windowed aggs, dropDuplicates*, session_window cover the common cases):
an arbitrary per-key accumulator maintained by the Structured Streaming
state store, with Arrow-batched (not per-row) user code.

Demo operator: per-user running totals (event count, value sum, latest
event time), emitted in `update` mode every time a key appears in a
micro-batch. Its end state equals the batch groupBy aggregate — pinned in
tests/test_streaming.py.

Scale notes (100 TB): state lives in the executor state store (RocksDB
backend in production: `spark.sql.streaming.stateStore.providerClass`),
partitioned by the group key, so state size scales out with executors;
the pandas function only ever sees one key's rows per call. Unbounded
key cardinality needs a timeout policy — pass
``GroupStateTimeout.ProcessingTimeTimeout`` and call
``state.setTimeoutDuration`` to evict idle keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double, last_ts timestamp"
STATE_SCHEMA = "n bigint, s double, last_us bigint"


def _running_totals(key, pdf_iter, state):
    import pandas as pd

    n, s, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdf_iter:
        n += len(pdf)
        s += float(pdf["value"].sum())
        # pandas timestamps are ns since epoch; state keeps micros
        last_us = max(last_us, int(pdf["ts"].astype("int64").max()) // 1000)
    state.update((n, s, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals over the parsed event stream."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_running_totals(spark, source_dir: str, query_name: str = "RunningTotals"):
    """File-mirror-source wiring; memory sink in update mode so the latest
    row per user is the converged accumulator."""
    from .sources import file_message_stream, parse_message_stream

    messages = file_message_stream(spark, source_dir)
    events = parse_message_stream(messages)
    totals = running_totals(events)
    return (
        totals.writeStream.queryName(query_name)
        .outputMode("update")
        .format("memory")
        .start()
    )
