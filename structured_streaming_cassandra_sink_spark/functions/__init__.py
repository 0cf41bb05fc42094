"""Shared column helpers usable across operator modules."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_micros(col: Column | str) -> Column:
    """Microseconds since epoch for TIMESTAMP *or* TIMESTAMP_NTZ columns.

    Spark's ``unix_micros`` rejects TIMESTAMP_NTZ (the type parquet
    timestamps read as when the file's isAdjustedToUTC flag is false).
    The session timezone is pinned to UTC (session.py), so casting
    NTZ -> TIMESTAMP is instant-preserving and a TIMESTAMP input is
    untouched — one expression serves both storage conventions.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def ts_millis(col: Column | str) -> Column:
    """Milliseconds since epoch; same NTZ-vs-TIMESTAMP contract as ts_micros."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c.cast("timestamp"))
