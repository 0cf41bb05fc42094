"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``structured_streaming_cassandra_sink_spark`` package; this module
only adapts the registry to the driver's contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from structured_streaming_cassandra_sink_spark.plans import registry


def _loaded() -> None:
    registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship reproduces the reference pipeline shape in batch on the
    `events` table: scan -> from_json -> flatten -> derive date -> filter ->
    latest-per-key dedup (SURVEY.md §7 M0).
    """
    _loaded()
    return registry.QUERIES["flagship_latest_event_per_user"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.3."""
    _loaded()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys absent here get the weaker
    rows-only check (non-SQL-expressible ops: LSH banding, pandas-UDF
    surface, approximate sketches)."""
    _loaded()
    return dict(registry.ORACLES)
