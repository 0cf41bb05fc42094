"""Set operations — union / intersect / except.

Spark maps INTERSECT/EXCEPT to aggregate- or join-based plans; DISTINCT is
a hash aggregate. One shuffle each on the full row as key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import load_table


def _custkeys_with_status(spark: SparkSession, sf_dir: str, status: str) -> DataFrame:
    return (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderstatus") == status)
        .select(F.col("o_custkey").alias("custkey"))
    )


@query(
    "set_union",
    """
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    UNION
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName + distinct ≡ SQL UNION (bag union then dedup)."""
    c = load_table(spark, "customer", sf_dir).select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, "supplier", sf_dir).select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@query(
    "set_intersect",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers holding both open and finished orders."""
    return _custkeys_with_status(spark, sf_dir, "O").intersect(
        _custkeys_with_status(spark, sf_dir, "F")
    )


@query(
    "set_except",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with open orders and no finished ones. subtract() is
    EXCEPT DISTINCT — removes a key entirely if it appears on the right
    (exceptAll would keep surplus multiplicity, different semantics)."""
    return _custkeys_with_status(spark, sf_dir, "O").subtract(
        _custkeys_with_status(spark, sf_dir, "F")
    )


@query(
    "set_intersect_all",
    """
    SELECT user_id FROM (SELECT user_id FROM events WHERE event_type = 'view')
    INTERSECT ALL
    SELECT user_id FROM (SELECT user_id FROM events WHERE event_type = 'click')
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: a user appearing 3x among views
    and 2x among clicks yields 2 rows (min of multiplicities), where
    set_intersect yields 1. Spark plans this as a count-aggregating
    join, not row-pairing — one shuffle per side on the full row."""
    e = load_table(spark, "events", sf_dir)
    v = e.filter(F.col("event_type") == "view").select("user_id")
    c = e.filter(F.col("event_type") == "click").select("user_id")
    return v.intersectAll(c)


@query(
    "set_except_all",
    """
    SELECT user_id FROM (SELECT user_id FROM events WHERE event_type = 'view')
    EXCEPT ALL
    SELECT user_id FROM (SELECT user_id FROM events WHERE event_type = 'click')
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference: multiplicities subtract (5 views,
    2 clicks -> 3 rows) instead of the distinct-EXCEPT's all-or-nothing.
    The multiplicity bookkeeping is a counted aggregate join, same
    shuffle shape as intersectAll."""
    e = load_table(spark, "events", sf_dir)
    v = e.filter(F.col("event_type") == "view").select("user_id")
    c = e.filter(F.col("event_type") == "click").select("user_id")
    return v.exceptAll(c)
