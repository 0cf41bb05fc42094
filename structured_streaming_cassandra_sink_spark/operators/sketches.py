"""Frequency-sketch operators — Count-Min with an oracle-checkable
error report.

Complements the existing sketch surface (`approx_distinct` /
`hll_partial_merge` for cardinality, `heavy_hitters` for top-k): CMS is
the classic bounded-memory FREQUENCY estimator (Cormode & Muthukrishnan,
J. Algorithms 2005 — public literature). At 100 TB the sketch is the
point: D x W counters (here 4 x 256 longs = 8 KB) summarize an
unbounded key domain, counters merge by cell-wise addition (map-side
partials do exactly that), and the estimate for any key is the min over
its D cells.

Oracle strategy — the `minhash_recall_report` pattern: DuckDB cannot
reproduce xxhash64 cells, so the query emits per-key EXACT counts (SQL-
computable) plus guarantee FLAGS the sketch must satisfy on any data:
`est >= exact` (CMS never under-counts, structural) and
`est <= exact + {EPS_MULT}·N/W` (the ε-slack bound; holds with margin on
the fixed testdata — verified at sf0.001/0.01/0.1 — because the min over
D={CMS_DEPTH} rows beats the single-row Markov bound). The driver hash
then checks real values, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import load_table, spread

CMS_DEPTH = 4      # independent hash rows
CMS_WIDTH = 256    # counters per row
EPS_MULT = 4.0     # flagged slack = EPS_MULT * N / WIDTH
TOP_N = 20         # keys reported (by exact count desc, key asc)


def _cell(d: int, key: F.Column) -> F.Column:
    """Row-d cell index: pmod (not abs%) — abs(INT32_MIN) overflow-safe
    (the round-2 ADVICE finding on the heavy-hitter shard)."""
    return F.pmod(F.xxhash64(F.lit(d), key), F.lit(CMS_WIDTH))


def countmin_report(events: DataFrame, key: str = "user_id") -> DataFrame:
    """(key, exact_cnt, est_ge_exact, est_within_eps) for the TOP_N keys.

    Build path is sketch-shaped even though the report also needs exact
    counts: the per-key aggregation happens ONCE (one shuffle), the
    D-row explode runs over the per-key lattice (|keys| x D rows, not
    |events| x D), and cell totals are a second bounded aggregation
    (<= D x W groups). The estimate join is per-key x D against the
    broadcast-sized cell table."""
    exact = events.groupBy(key).agg(F.count("*").alias("exact_cnt"))
    cells = F.array(
        *[
            F.struct(F.lit(d).alias("d"), _cell(d, F.col(key)).alias("cell"))
            for d in range(CMS_DEPTH)
        ]
    )
    keyed = exact.select(
        F.col(key), "exact_cnt", F.explode(cells).alias("c")
    ).select(key, "exact_cnt", F.col("c.d").alias("d"), F.col("c.cell").alias("cell"))
    # CMS counter table: sum of counts of every key landing in the cell.
    counters = keyed.groupBy("d", "cell").agg(F.sum("exact_cnt").alias("cnt"))
    est = (
        keyed.join(F.broadcast(counters), ["d", "cell"])
        .groupBy(key, "exact_cnt")
        .agg(F.min("cnt").alias("est"))
    )
    total = events.groupBy().agg(F.count("*").alias("n_total"))
    slack = F.lit(EPS_MULT) * F.col("n_total") / F.lit(CMS_WIDTH)
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            key,
            "exact_cnt",
            (F.col("est") >= F.col("exact_cnt")).alias("est_ge_exact"),
            (F.col("est") <= F.col("exact_cnt") + slack).alias("est_within_eps"),
        )
        .orderBy(F.desc("exact_cnt"), key)
        .limit(TOP_N)
    )


@query(
    "countmin_sketch_report",
    f"""
    SELECT user_id, count(*)::BIGINT AS exact_cnt,
           TRUE AS est_ge_exact, TRUE AS est_within_eps
    FROM events GROUP BY user_id
    ORDER BY exact_cnt DESC, user_id LIMIT {TOP_N}
    """,
)
def countmin_sketch_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency estimates for the hottest {TOP_N} users with
    structural-guarantee flags (never-undercount; within ε·N slack). The
    oracle pins the exact counts and asserts both flags are TRUE."""
    ev = spread(load_table(spark, "events", sf_dir))
    return countmin_report(ev)
