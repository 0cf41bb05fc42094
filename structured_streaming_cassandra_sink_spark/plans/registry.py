"""Query registry — the driver-facing operator surface.

Each implemented operator from SURVEY.md §2.3 registers here as a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB oracle
SQL string. ``__spark_entry__.py`` exposes these via ``queries()`` /
``oracle_sql()``.

Contract reminders (driver compare, __spark_entry__.py docstring):
- Columns are sorted by NAME before value hashing — every computed column
  must carry the SAME alias in the Spark plan and the oracle SQL.
- Floating aggregates are rounded identically on both sides so partial-
  aggregation order (Spark) vs sequential order (DuckDB) cannot flip bits.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle.

    Queries with ``oracle=None`` get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible ops: LSH banding, pandas-UDF
    surfaces, approximate sketches whose value differs by implementation).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from . import flagship  # noqa: F401
    from ..operators import (  # noqa: F401
        relational,
        windows,
        setops,
        scalar,
        dedup,
        similarity,
        text,
        multimodal,
        curation,
        timeseries,
    )
    from ..streaming import batch_equiv  # noqa: F401
