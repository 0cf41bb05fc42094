"""Bucketed-table layout — shuffle-free co-located joins.

At 100 TB the fact-fact join (lineitem ⋈ orders on orderkey) is the
expensive shuffle. Bucketing both tables by the join key at WRITE time
moves that shuffle out of every query and into ingestion, once:
`bucketBy(n, key)` hashes rows into n files per partition; two tables
bucketed by the same key with the same n join with NO Exchange on either
side (Spark trusts the layout). The plan-shape test in
tests/test_plans.py pins this.

Sizing: pick n so one bucket of the BIG table ~ 100-200 MB (fits an
executor task comfortably); n must be equal (or an integer multiple,
with spark.sql.bucketing.coalesceBucketsInJoin.enabled) on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed parquet table."""
    writer = df.write.format("parquet").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.mode("overwrite").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-key-bucketed tables — planner elides both shuffles."""
    return spark.table(left_table).join(spark.table(right_table), key)
