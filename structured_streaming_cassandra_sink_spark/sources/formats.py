"""Interchange-format readers/writers — JSONL and CSV round-trips.

Parquet is the engine's native storage (tables.py); these are the
EXCHANGE formats a training-data pipeline meets at its edges: JSONL is
the de-facto LLM-corpus interchange format (one JSON object per line —
exactly the reference's Kafka wire payload shape, cassandra_sink.scala:92-97,
persisted to files), CSV is the lowest-common-denominator for tabular
drops. Both writers/readers declare schemas EXPLICITLY — inference reads
the data twice and can mistype empty/ambiguous columns, which at 100 TB
is both a correctness and a cost bug.

Scale notes: JSON/CSV scans get column pruning but (unlike parquet) no
predicate pushdown or row-group skipping — the docstring contract is
"read once at the edge, convert to parquet, query the parquet". Both
formats split by line so they parallelize per-file-block like any text
source (gzip, which is non-splittable, is the classic trap — leave
edge files uncompressed or use zstd-seekable)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Micros-precision wire formats shared with the streaming mirror
# (streaming/sources.py): default SSS truncates micros. TIMESTAMP_NTZ
# columns (the tables' storage convention) take the offset-free NTZ
# variant; tz-aware columns keep the offset one. Passing both options is
# harmless — each applies only to its own timestamp class.
TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
TS_NTZ_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def write_jsonl(df: DataFrame, path: str) -> None:
    """One JSON object per line (Spark's json sink IS jsonl)."""
    (
        df.write.mode("overwrite")
        .option("timestampFormat", TS_FORMAT)
        .option("timestampNTZFormat", TS_NTZ_FORMAT)
        .json(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("timestampFormat", TS_FORMAT)
        .option("timestampNTZFormat", TS_NTZ_FORMAT)
        .option("mode", "FAILFAST")  # edge data: fail loud, don't null-fill
        .json(path)
    )


def write_csv(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", TS_FORMAT)
        .option("timestampNTZFormat", TS_NTZ_FORMAT)
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", TS_FORMAT)
        .option("timestampNTZFormat", TS_NTZ_FORMAT)
        .option("mode", "FAILFAST")
        .csv(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    """ORC — the second columnar format at the edges (Hive-ecosystem
    drops). Unlike JSONL/CSV it keeps types, stripes, and min/max
    statistics, so a converted corpus queries with pushdown + pruning
    like parquet; binary and TIMESTAMP_NTZ columns round-trip natively
    (no format-string contract needed)."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema declared explicitly, same contract as the other readers —
    ORC files carry their own schema, but declaring pins column ORDER
    and classes so a drifted producer fails loud instead of silently
    widening types."""
    return spark.read.schema(schema).orc(path)
