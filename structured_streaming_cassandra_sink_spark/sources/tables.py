"""Batch table readers over the driver's parquet testdata.

Generalizes reference capability class #1 (streaming source scan,
cassandra_sink.scala:98-103) to its batch twin: ``spark.read.parquet``.

Scale notes: parquet scans get predicate pushdown + column pruning from
Catalyst for free as long as callers express filters/projections on the
DataFrame (never collect-then-filter). At 100 TB the same code reads a
partitioned table directory; partition pruning applies when the path is
hive-partitioned.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one testdata table by name.

    Schemas are declared in :mod:`..schemas`; for parquet we let the file
    metadata drive (parquet is self-describing and the driver generated it)
    but the registry is the contract tests assert against.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TABLES)}")
    if name == "events":
        # Runtime-settable; needed even when the caller (e.g. the driver
        # harness) built the session without our factory.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS); with
        # spark.sql.legacy.parquet.nanosAsLong it arrives as long nanos.
        # Integer `div` (not `/`): nanos ~1.7e18 exceed double's 2^53
        # exact-integer range, float division would corrupt microseconds.
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return _normalize_timestamps(df, TABLES[name])


def _normalize_timestamps(df: DataFrame, declared) -> DataFrame:
    """Cast timestamp columns to the DECLARED timestamp class.

    The driver regenerates testdata between rounds and the parquet
    timestamp convention has flipped (round 1: TIMESTAMP(NANOS) /
    isAdjustedToUTC=true -> TimestampType; round 2: isAdjustedToUTC=false
    -> TimestampNTZType). The declared schema (schemas.py) is the
    contract: NTZ, matching the DuckDB oracle's naive timestamps. With
    the session timezone pinned to UTC the TZ<->NTZ cast is
    instant-preserving. On the expected path (file already NTZ) no cast
    is inserted, so parquet filter pushdown is untouched.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    actual = {f.name: f.dataType for f in df.schema.fields}
    fixes = {
        f.name: F.col(f.name).cast(f.dataType)
        for f in declared.fields
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))
        and f.name in actual
        and actual[f.name] != f.dataType
        and isinstance(actual[f.name], (T.TimestampType, T.TimestampNTZType))
    }
    return df.withColumns(fixes) if fixes else df


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in (names or sorted(TABLES))}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Restore parallelism for small single-file inputs feeding
    compute-heavy per-row operators (shingling, per-gram hashing,
    vector math, pandas-UDF decode).

    A parquet file with one row group arrives as ONE partition no matter
    what spark.sql.files.maxPartitionBytes says — so without this, a
    32-core local run (or a 1000-core cluster reading a consolidated
    small dimension) does all its per-row work on one core. No-op when
    the input is already at least default-parallelism wide, so at real
    scale (many files / row groups) it costs nothing; below that, one
    tiny round-robin shuffle buys full fan-out."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def table_rowcount(name: str, sf_dir: str = DEFAULT_SF_DIR) -> int:
    """Exact row count from parquet FOOTER metadata — no Spark job.

    Regime selectors (e.g. dedup_embedding_lsh's demo/production switch)
    need n_corpus before planning; an eager df.count() costs a full scan
    job on every invocation (ADVICE r8). Parquet footers carry the exact
    count, so this is a driver-side metadata read (one footer per file),
    the same statistic a lakehouse table format would serve from its
    manifest at 100 TB."""
    import pyarrow.dataset as pads

    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TABLES)}")
    return pads.dataset(
        os.path.join(sf_dir, f"{name}.parquet"), format="parquet"
    ).count_rows()
