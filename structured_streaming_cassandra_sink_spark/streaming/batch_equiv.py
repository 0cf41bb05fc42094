"""Batch-equivalent forms of the streaming windows (SURVEY.md §2.3
stream_* rows).

Spark's window()/session_window() functions work identically over batch
DataFrames — these queries ARE the streaming aggregations, executed on the
bounded events table so the DuckDB oracle can verify the semantics. The
streaming twins (same expressions + watermark + incremental state) live in
streaming/pipeline.py; tests assert the streaming output equals these
batch results (the hard part (b) strategy from SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import load_table

SESSION_GAP_MIN = 15


def tumbling_agg(events: DataFrame) -> DataFrame:
    """1-hour tumbling windows per event_type (shared batch/stream)."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "stream_tumbling",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts)                    AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR  AS window_end,
           event_type,
           count(*)                                              AS n,
           round(sum(value), 4)                                  AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_agg(load_table(spark, "events", sf_dir))


def sliding_agg(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 30 min — shared batch/stream
    expression tree (like tumbling_agg/session_agg: ONE definition, two
    execution modes, so the pinned stream==batch equality can't drift
    through a hand-synced copy)."""
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "stream_sliding",
    """
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           event_type,
           count(*)             AS n,
           round(sum(value), 4) AS sum_value
    FROM (
      SELECT time_bucket(INTERVAL '30 minutes', ts)
               - k * (INTERVAL '30 minutes')  AS window_start,
             event_type, value
      FROM events, unnest([0, 1]) AS t(k))
    GROUP BY 1, 2, 3
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window agg, batch twin: each event lands in exactly 2
    windows (Spark plans this as one Expand — same trick the oracle's
    unnest([0,1]) spells out)."""
    return sliding_agg(load_table(spark, "events", sf_dir))


def session_agg(events: DataFrame) -> DataFrame:
    """Session windows per user (15-min inactivity gap) — shared batch/stream."""
    return (
        events.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_session",
    f"""
    WITH marked AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '{SESSION_GAP_MIN} minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    numbered AS (
      -- event_id tie-break: with ROWS framing, tied-ts rows would get
      -- order-dependent (flaky) session ids without a total order
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked)
    SELECT user_id,
           min(ts)                                          AS session_start,
           max(ts) + INTERVAL '{SESSION_GAP_MIN} minutes'   AS session_end,
           count(*)                                         AS n_events,
           round(sum(value), 4)                             AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window in batch mode; the oracle derives the same sessions
    with the classic gaps-and-islands construction (session_end = last
    event + gap, matching Spark's definition)."""
    return session_agg(load_table(spark, "events", sf_dir))


def tumbling_distinct_agg(events: DataFrame, exact: bool = True) -> DataFrame:
    """Hourly distinct-user cardinality per event_type — the streaming
    cardinality rollup. Batch mode counts EXACTLY; the streaming twin
    (streaming/pipeline.py streaming_tumbling_distinct) swaps in
    approx_count_distinct, because exact distinct needs per-window
    distinct state (unbounded per key) where the HLL sketch is O(1) and
    MERGEABLE across micro-batches — at 100 TB the sketch form is the
    only one that streams. The 5% rsd contract between the two is
    pinned in tests/test_streaming.py."""
    agg = (
        F.count_distinct(F.col("user_id"))
        if exact
        else F.approx_count_distinct("user_id")
    )
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(agg.alias("users"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "users",
        )
    )


@query(
    "stream_tumbling_distinct",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts)                    AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR  AS window_end,
           event_type,
           count(DISTINCT user_id)                               AS users
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_tumbling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_distinct_agg(load_table(spark, "events", sf_dir), exact=True)


def enrich_static_agg(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment + tumbling rollup (shared batch/stream):
    each event picks up its user's market segment from a broadcast
    static dimension, then aggregates per (hour, segment). LEFT join:
    events from users outside the dimension land in the NULL-segment
    group instead of vanishing (the silent-data-loss default of an inner
    enrich)."""
    e = events.join(F.broadcast(dim), "user_id", "left")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "segment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "segment",
            "n",
            "sum_value",
        )
    )


def customer_segment_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, segment) static dimension from the customer table."""
    return load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )


@query(
    "stream_enrich_static",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts)                    AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR  AS window_end,
           c.c_mktsegment                                        AS segment,
           count(*)                                              AS n,
           round(sum(value), 4)                                  AS sum_value
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2, 3
    """,
)
def stream_enrich_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-equivalent of the stream-static broadcast enrichment — the
    most common production streaming shape after plain windowed aggs
    (every event pipeline joins a user/account dimension). Structured
    Streaming re-reads the static side per micro-batch and broadcasts
    it; the stream twin is pinned equal in
    tests/test_streaming.py::test_stream_static_join (same join) and
    the shared expression here keeps batch and stream from drifting.
    At 100 TB the dimension is broadcast (or bucketed when it outgrows
    memory) — the event stream itself never shuffles for the join."""
    return enrich_static_agg(
        load_table(spark, "events", sf_dir),
        customer_segment_dim(spark, sf_dir),
    )
