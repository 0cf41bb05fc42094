"""ML evaluation & feature-engineering operators.

The read-out and feature-prep passes a training pipeline runs AFTER the
data is curated: ranking metrics (AUC, Gini, lift), calibration and
drift monitors (calibration bins, PSI, KS), significance/selection
statistics (chi-square, block jackknife), and the two classic
large-scale feature transforms (hashing trick, smoothed target
encoding). The reference pipeline (cassandra_sink.scala:113-120) stops
at filter/derive; these generalize its aggregate surface to the model
side of the same tables.

Scale notes common to the family:

- **Ranking stats never rank rows.** AUC/Gini/KS are computed on the
  (group, distinct-score) LATTICE: one hash aggregation collapses the
  table to per-score counts, and the rank/CDF windows run over the
  lattice, whose size is bounded by score cardinality — NOT by row
  count. A 100 TB orders table with 2-decimal prices has the same
  lattice as a 1 GB one; the window task never sees raw rows. This is
  the same bounded-lattice trick `histogram_width_bucket` and the
  two-pass prefix sum use.
- **Integer-exact rank sums.** The Mann-Whitney/Lorenz rank sums are
  split into pure-integer Σ npos·cum and Σ npos·(n+1) pieces so both
  engines sum EXACT integers (no float partial-merge drift); floats
  appear only in the final division. At ~10^10 rows per group the
  int64 product headroom runs out — production would switch the two
  sums to DECIMAL(38,0); documented, not needed at test scale.
- **Scalar side-inputs broadcast.** min/max/global-rate scalars come
  from a 1-row aggregate cross-joined (broadcast) into the map side —
  never a driver collect, never a shuffle.
- All float outputs rounded on BOTH engines (4dp for value-scale,
  6dp for rates in [0,1]) per the registry FP-parity contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exactagg import hilo_sum_sql
from ..plans.registry import query
from ..sources import load_table, spread

# Binary label convention for the orders table: an order is "positive"
# when finalized. Single owner — every metric below uses this expression.
_LABEL_SQL = "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END"


def _label() -> F.Column:
    return F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)


N_BINS = 10          # equal-width bins for calibration / PSI / lift
PSI_SMOOTH = 1       # Laplace add-one on bin counts (both periods)
TE_SMOOTH = 50       # target-encoding pseudo-count toward the global rate
JK_BLOCKS = 32       # jackknife delete-one-block count
CONF_THRESHOLD = 150000.0  # confusion-matrix decision threshold on price


def _bin_col(x: F.Column, lo: F.Column, hi: F.Column) -> F.Column:
    """Equal-width bin id in [0, N_BINS): floor((x-lo)/step), top edge
    clamped into the last bin. Pure codegen arithmetic; identical op
    order to `_bin_sql` so the FP results are bit-equal cross-engine."""
    step = (hi - lo) / float(N_BINS)
    return F.least(
        F.lit(N_BINS - 1).cast("bigint"), F.floor((x - lo) / step)
    ).cast("int")


def _bin_sql(x: str, lo: str = "lo", hi: str = "hi") -> str:
    return (
        f"CAST(LEAST({N_BINS - 1}, FLOOR(({x} - {lo})"
        f" / (({hi} - {lo}) / {float(N_BINS)}))) AS INT)"
    )


def _md5_mod(col: F.Column, m: int) -> F.Column:
    """First 8 md5 hex chars mod m — the repo's engine-portable hash
    (see curation.hash_bucket; md5 is bit-identical everywhere)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint") % m
    ).cast("int")


def _md5_mod_sql(col: str, m: int) -> str:
    return f"CAST(('0x' || substr(md5({col}), 1, 8))::BIGINT % {m} AS INT)"


# --------------------------------------------------------------- roc_auc


@query(
    "roc_auc",
    f"""
    WITH g AS (
      SELECT o_orderpriority AS priority, o_totalprice AS score,
             CAST(count(*) AS BIGINT)           AS n,
             CAST(sum({_LABEL_SQL}) AS BIGINT)  AS npos
      FROM orders GROUP BY 1, 2),
    r AS (
      SELECT priority, n, npos,
             COALESCE(sum(n) OVER (PARTITION BY priority ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS cumb
      FROM g),
    a AS (
      SELECT priority,
             CAST(sum(n) AS BIGINT)              AS n_orders,
             CAST(sum(npos) AS BIGINT)           AS n_pos,
             CAST(sum(npos * cumb) AS BIGINT)    AS s_cum,
             CAST(sum(npos * (n + 1)) AS BIGINT) AS s_tie
      FROM r GROUP BY priority)
    SELECT priority, n_orders, n_pos,
           round((s_cum + s_tie / 2.0 - n_pos * (n_pos + 1) / 2.0)
                 / (n_pos * 1.0 * (n_orders - n_pos)), 6) AS auc
    FROM a
    """,
)
def roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC per order priority via the Mann-Whitney rank-sum, with
    exact midrank tie handling — "how well does price rank finalized
    orders first?". Computed on the (priority, distinct-price) lattice:
    one hash agg collapses rows to per-score (n, npos) counts, a
    cumulative window over the LATTICE (bounded by price cardinality,
    not row count) assigns rank offsets, and the average-rank sum
    Σ npos·(cumb + (n+1)/2) is split into two INTEGER sums (s_cum,
    s_tie) so both engines accumulate exactly; the only float op is the
    final division, on identical operands. AUC = (R⁺ - P(P+1)/2)/(P·N).
    """
    o = load_table(spark, "orders", sf_dir)
    g = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("score"),
    ).agg(F.count("*").alias("n"), F.sum(_label()).alias("npos"))
    w = (
        Window.partitionBy("priority")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = g.withColumn(
        "cumb", F.coalesce(F.sum("n").over(w), F.lit(0).cast("bigint"))
    )
    a = r.groupBy("priority").agg(
        F.sum("n").alias("n_orders"),
        F.sum("npos").alias("n_pos"),
        F.sum(F.col("npos") * F.col("cumb")).alias("s_cum"),
        F.sum(F.col("npos") * (F.col("n") + 1)).alias("s_tie"),
    )
    npos = F.col("n_pos")
    auc = (
        F.col("s_cum") + F.col("s_tie") / 2.0 - npos * (npos + 1) / 2.0
    ) / (npos * 1.0 * (F.col("n_orders") - npos))
    return a.select(
        "priority", "n_orders", "n_pos", F.round(auc, 6).alias("auc")
    )


# ----------------------------------------------------------- gini_lorenz


@query(
    "gini_lorenz",
    """
    WITH g AS (
      SELECT o_orderpriority AS priority, o_totalprice AS x,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2),
    r AS (
      SELECT priority, x, n,
             COALESCE(sum(n) OVER (PARTITION BY priority ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS cumb
      FROM g)
    SELECT priority,
           CAST(sum(n) AS BIGINT) AS n_orders,
           round(2.0 * sum(x * (n * cumb + n * (n + 1) / 2.0))
                   / (sum(n) * sum(x * n))
                 - (sum(n) + 1.0) / sum(n), 6) AS gini
    FROM r GROUP BY priority
    """,
)
def gini_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of revenue per priority (Lorenz rank form
    G = 2·Σrᵢxᵢ/(n·Σx) − (n+1)/n, midrank ties) — "is spend dominated
    by a few whale orders?". Same bounded-lattice shape as `roc_auc`:
    rows collapse to (priority, distinct-price, n) first, the rank
    window runs over the lattice, and a tie group of n equal values
    contributes x·(n·cumb + n(n+1)/2) in closed form — no per-row
    ranking anywhere. One agg shuffle + one lattice window + one group
    agg; float sums are Σ over the lattice only, absorbed by round(6).
    """
    o = load_table(spark, "orders", sf_dir)
    g = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("x"),
    ).agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("priority")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = g.withColumn(
        "cumb", F.coalesce(F.sum("n").over(w), F.lit(0).cast("bigint"))
    )
    n, x, cumb = F.col("n"), F.col("x"), F.col("cumb")
    a = r.groupBy("priority").agg(
        F.sum("n").alias("n_orders"),
        F.sum(x * (n * cumb + n * (n + 1) / 2.0)).alias("ranksum_x"),
        F.sum(x * n).alias("sum_x"),
    )
    tot = F.col("n_orders")
    gini = 2.0 * F.col("ranksum_x") / (tot * F.col("sum_x")) - (
        tot + 1.0
    ) / tot
    return a.select("priority", "n_orders", F.round(gini, 6).alias("gini"))


# ------------------------------------------------------------ ks_statistic


@query(
    "ks_statistic",
    """
    WITH g AS (
      SELECT round(o_totalprice, -2) AS grid,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS nf,
             CAST(sum(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS nr
      FROM orders GROUP BY 1),
    c AS (
      SELECT grid,
             sum(nf) OVER (ORDER BY grid) AS cf,
             sum(nr) OVER (ORDER BY grid) AS cr,
             sum(nf) OVER () AS tf,
             sum(nr) OVER () AS tr
      FROM g)
    SELECT round(abs(cf * 1.0 / tf - cr * 1.0 / tr), 6) AS ks_d,
           grid AS at_price
    FROM c
    ORDER BY ks_d DESC, at_price ASC
    LIMIT 1
    """,
)
def ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the price
    distributions of finalized vs non-finalized orders — the standard
    "did the feature distribution shift between cohorts?" monitor.
    Computed on a quantized price lattice (round to $100): rows
    collapse to per-cell (nf, nr) counts, both empirical CDFs come from
    cumulative windows over the lattice, and D = max|F₁−F₂|. The
    unpartitioned window is over LATTICE CELLS only (price-range/100
    rows — thousands, independent of table size), so the single-task
    window that would be a scale bug on raw rows is a bounded constant
    here. D is rounded to 6dp BEFORE the argmax so an ULP difference
    between engines cannot flip which cell wins; ties break on price.
    """
    o = load_table(spark, "orders", sf_dir)
    g = o.groupBy(F.round("o_totalprice", -2).alias("grid")).agg(
        F.sum(_label()).alias("nf"),
        F.sum(F.when(F.col("o_orderstatus") != "F", 1).otherwise(0)).alias(
            "nr"
        ),
    )
    wcum = Window.orderBy("grid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = g.select(
        "grid",
        F.sum("nf").over(wcum).alias("cf"),
        F.sum("nr").over(wcum).alias("cr"),
        F.sum("nf").over(wall).alias("tf"),
        F.sum("nr").over(wall).alias("tr"),
    )
    d = F.abs(
        F.col("cf") * 1.0 / F.col("tf") - F.col("cr") * 1.0 / F.col("tr")
    )
    return (
        c.select(F.round(d, 6).alias("ks_d"), F.col("grid").alias("at_price"))
        .orderBy(F.desc("ks_d"), F.asc("at_price"))
        .limit(1)
    )


# -------------------------------------------------------- calibration_bins


@query(
    "calibration_bins",
    f"""
    WITH mm AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
                FROM orders)
    SELECT {_bin_sql('o_totalprice')} AS bin,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END),
                 6) AS frac_pos,
           round(avg((o_totalprice - lo) / (hi - lo)), 6) AS mean_score
    FROM orders CROSS JOIN mm
    GROUP BY 1
    """,
)
def calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration table: bucket the score (price, min-max normalized)
    into {N_BINS} equal-width bins and compare each bin's observed
    positive rate against its mean normalized score — the reliability-
    diagram input. The (lo, hi) scalars are a 1-row aggregate
    cross-joined (Spark: broadcast) into the map side, so the whole
    query is scan → broadcast-scalar join → one hash agg of {N_BINS}
    groups; no window, no second shuffle. Bin arithmetic is the shared
    `_bin_col`/`_bin_sql` pair (bit-identical FP op order)."""
    o = load_table(spark, "orders", sf_dir)
    mm = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    lo, hi = F.col("lo"), F.col("hi")
    x = F.col("o_totalprice")
    return (
        o.crossJoin(F.broadcast(mm))
        .groupBy(_bin_col(x, lo, hi).alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.avg(F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0)),
                6,
            ).alias("frac_pos"),
            F.round(F.avg((x - lo) / (hi - lo)), 6).alias("mean_score"),
        )
    )


# --------------------------------------------------------------- psi_drift


@query(
    "psi_drift",
    f"""
    WITH mm AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
    g AS (
      SELECT {_bin_sql('value')} AS bin,
             CAST(sum(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1,
             CAST(sum(CASE WHEN day(ts) > 15 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n2
      FROM events CROSS JOIN mm GROUP BY 1),
    t AS (SELECT sum(n1) AS t1, sum(n2) AS t2 FROM g)
    SELECT bin,
           round((n1 + {PSI_SMOOTH}) * 1.0 / (t1 + {PSI_SMOOTH * N_BINS}),
                 6) AS p_ref,
           round((n2 + {PSI_SMOOTH}) * 1.0 / (t2 + {PSI_SMOOTH * N_BINS}),
                 6) AS p_cur,
           round(((n2 + {PSI_SMOOTH}) * 1.0 / (t2 + {PSI_SMOOTH * N_BINS})
                  - (n1 + {PSI_SMOOTH}) * 1.0 / (t1 + {PSI_SMOOTH * N_BINS}))
                 * ln(((n2 + {PSI_SMOOTH}) * 1.0 / (t2 + {PSI_SMOOTH * N_BINS}))
                      / ((n1 + {PSI_SMOOTH}) * 1.0
                         / (t1 + {PSI_SMOOTH * N_BINS}))), 6) AS psi_term
    FROM g CROSS JOIN t
    """,
)
def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the month — THE production drift monitor for a feature column. Both
    periods share one global equal-width binning (min/max broadcast
    scalars), per-bin counts come from ONE conditional aggregation over
    a single scan (no per-period scans, no join between periods), and
    the add-one-smoothed PSI term (p₂−p₁)·ln(p₂/p₁) is computed per
    bin; Σ terms ≥ 0 always (it is a symmetrized KL). Laplace smoothing
    makes empty bins well-defined without epsilon hacks. Complements
    `cusum_changepoint` (sequential drift) with a distributional view.
    """
    e = load_table(spark, "events", sf_dir)
    mm = e.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    g = (
        e.crossJoin(F.broadcast(mm))
        .groupBy(_bin_col(F.col("value"), F.col("lo"), F.col("hi")).alias("bin"))
        .agg(
            F.sum(
                F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0)
            ).alias("n1"),
            F.sum(F.when(F.dayofmonth("ts") > 15, 1).otherwise(0)).alias("n2"),
        )
    )
    t = g.agg(F.sum("n1").alias("t1"), F.sum("n2").alias("t2"))
    sm, smn = PSI_SMOOTH, PSI_SMOOTH * N_BINS
    p1 = (F.col("n1") + sm) * 1.0 / (F.col("t1") + smn)
    p2 = (F.col("n2") + sm) * 1.0 / (F.col("t2") + smn)
    return g.crossJoin(F.broadcast(t)).select(
        "bin",
        F.round(p1, 6).alias("p_ref"),
        F.round(p2, 6).alias("p_cur"),
        F.round((p2 - p1) * F.log(p2 / p1), 6).alias("psi_term"),
    )


# ------------------------------------------------- target_encode_smoothed


@query(
    "target_encode_smoothed",
    f"""
    WITH j AS (
      SELECT c.c_mktsegment AS segment, {_LABEL_SQL} AS label
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    t AS (SELECT avg(label * 1.0) AS gmean FROM j)
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(avg(label * 1.0), 6) AS raw_rate,
           round((sum(label) + {TE_SMOOTH} * gmean)
                 / (count(*) + {TE_SMOOTH}), 6) AS encoded
    FROM j CROSS JOIN t
    GROUP BY segment, gmean
    """,
)
def target_encode_smoothed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian-smoothed target encoding of market segment against the
    finalized-order label: enc = (Σy + m·ȳ_global)/(n + m), m={TE_SMOOTH}
    — the leakage-resistant categorical encoder every tabular pipeline
    ships. customer is the dim side (broadcast at this shape; at 100 TB
    both sides are fact-scale and AQE picks sort-merge on the bucketed
    custkey). The global rate is a 1-row aggregate broadcast back; the
    encoding itself is one hash agg over the handful of segments, so
    the train-time transform is a broadcast-map over the fact table.
    The label sum is integer-exact; only the final blend is float."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    j = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o.o_custkey == F.col("c_custkey"),
    ).select(F.col("c_mktsegment").alias("segment"), _label().alias("label"))
    t = j.agg(F.avg(F.col("label") * 1.0).alias("gmean"))
    return (
        j.crossJoin(F.broadcast(t))
        .groupBy("segment", "gmean")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg(F.col("label") * 1.0), 6).alias("raw_rate"),
            F.round(
                (F.sum("label") + TE_SMOOTH * F.col("gmean"))
                / (F.count("*") + TE_SMOOTH),
                6,
            ).alias("encoded"),
        )
        .drop("gmean")
    )


# ------------------------------------------------------- chi2_independence


@query(
    "chi2_independence",
    """
    WITH cells AS (
      SELECT c.c_mktsegment AS segment, o.o_orderstatus AS status,
             CAST(count(*) AS BIGINT) AS observed
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    x AS (
      SELECT segment, status, observed,
             sum(observed) OVER (PARTITION BY segment) AS rt,
             sum(observed) OVER (PARTITION BY status) AS ct,
             sum(observed) OVER () AS n
      FROM cells)
    SELECT segment, status, observed,
           round(rt * 1.0 * ct / n, 4) AS expected,
           round((observed - rt * 1.0 * ct / n)
                 * (observed - rt * 1.0 * ct / n)
                 / (rt * 1.0 * ct / n), 6) AS chi2_term
    FROM x
    """,
)
def chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence cells for market segment × order status —
    the categorical feature-selection / AB-sanity statistic. The fact
    join collapses immediately to the |segments|×|statuses| contingency
    table (one hash agg), and the row/column/grand totals are windows
    over THOSE ~15 cells, not over rows — the marginal computation is
    O(cells) wherever the table size goes. Each output row carries the
    observed count, the expected count under independence rt·ct/n, and
    its (O−E)²/E contribution (Σ = the chi-square statistic; dof =
    (R−1)(C−1) is implied by the cell count). Integer counts make the
    float expectation bit-identical cross-engine."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    cells = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            o.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(F.count("*").alias("observed"))
    )
    rt = F.sum("observed").over(
        Window.partitionBy("segment").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    ct = F.sum("observed").over(
        Window.partitionBy("status").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    n = F.sum("observed").over(
        Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    x = cells.select(
        "segment", "status", "observed",
        rt.alias("rt"), ct.alias("ct"), n.alias("n"),
    )
    e = F.col("rt") * 1.0 * F.col("ct") / F.col("n")
    o_ = F.col("observed")
    return x.select(
        "segment",
        "status",
        "observed",
        F.round(e, 4).alias("expected"),
        F.round((o_ - e) * (o_ - e) / e, 6).alias("chi2_term"),
    )


# ------------------------------------------------------------ feature_hash


FH_BUCKETS = 16


@query(
    "feature_hash",
    f"""
    WITH feats AS (
      SELECT user_id, event_type AS feat FROM events
      UNION ALL
      SELECT user_id,
             'k=' || CAST(CAST(json_extract(props, '$.k') AS BIGINT)
                          AS VARCHAR)
      FROM events),
    h AS (
      SELECT user_id, {_md5_mod_sql('feat', FH_BUCKETS)} AS bucket
      FROM feats WHERE feat IS NOT NULL)
    SELECT user_id, bucket, CAST(count(*) AS BIGINT) AS cnt
    FROM h GROUP BY 1, 2
    """,
)
def feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurizer: every event contributes its type and
    its parsed `props.k` as string features, each hashed into a fixed
    {FH_BUCKETS}-bucket space (md5-based — the repo's engine-portable
    hash; collisions are the accepted price of a fixed-width vector),
    then counted per user into a sparse long-form (user, bucket, cnt)
    vector. Spark side derives both features in ONE scan with
    explode(array(...)); the oracle spells the same thing as UNION ALL.
    groupBy(user, bucket) is the single shuffle; output width is bounded
    by {FH_BUCKETS} per user regardless of vocabulary growth — the whole
    point of feature hashing at 100 TB."""
    from ..schemas import EVENT_PROPS

    e = load_table(spark, "events", sf_dir)
    kfeat = F.concat(
        F.lit("k="),
        F.from_json(F.col("props"), EVENT_PROPS)
        .getField("k")
        .cast("string"),
    )
    feats = e.select(
        "user_id",
        F.explode(F.array(F.col("event_type"), kfeat)).alias("feat"),
    ).filter(F.col("feat").isNotNull())
    return feats.groupBy(
        "user_id", _md5_mod(F.col("feat"), FH_BUCKETS).alias("bucket")
    ).agg(F.count("*").alias("cnt"))


# ------------------------------------------------------------ jackknife_ci


@query(
    "jackknife_ci",
    f"""
    WITH b AS (
      SELECT {_md5_mod_sql('CAST(event_id AS VARCHAR)', JK_BLOCKS)} AS block,
             CAST(count(*) AS BIGINT) AS n_b,
             sum(value) AS s_b
      FROM events GROUP BY 1),
    t AS (SELECT CAST(sum(n_b) AS BIGINT) AS n, sum(s_b) AS s,
                 CAST(count(*) AS BIGINT) AS nb
          FROM b),
    th AS (SELECT (s - s_b) / (n - n_b) AS theta, n, s, nb
           FROM b CROSS JOIN t),
    tb AS (SELECT avg(theta) AS tbar FROM th),
    v AS (SELECT any_value(n) AS n, any_value(s) AS s,
                 any_value(nb) AS nb,
                 sum((theta - tbar) * (theta - tbar)) AS ssq
          FROM th CROSS JOIN tb)
    SELECT round(s / n, 4) AS mean_value,
           round(sqrt((nb - 1.0) / nb * ssq), 6) AS se_jack,
           round(s / n - 1.96 * sqrt((nb - 1.0) / nb * ssq), 4) AS ci_lo,
           round(s / n + 1.96 * sqrt((nb - 1.0) / nb * ssq), 4) AS ci_hi
    FROM v
    """,
)
def jackknife_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-BLOCK jackknife CI for the mean event value — the
    distributed answer to "error bars on a 100 TB aggregate" (a true
    bootstrap needs resampling; the block jackknife needs only
    {JK_BLOCKS} partial sums). Rows hash (md5, deterministic) into
    {JK_BLOCKS} blocks; one aggregation yields per-block (n_b, Σx); each
    leave-one-block-out mean θ_b = (S−s_b)/(N−n_b) is pure arithmetic on
    the {JK_BLOCKS}-row side table; var = (B−1)/B·Σ(θ_b−θ̄)², computed
    TWO-PASS against the explicit θ̄ (never E[θ²]−E[θ]² — the
    catastrophic-cancellation form the round-2 advisor flagged in
    incremental_stats_merge). Everything after the single scan is
    driver-free constant-size work. Value-scale outputs round to 4dp
    (float Σvalue partial-merge drift), the se to 6dp."""
    e = load_table(spark, "events", sf_dir)
    b = e.groupBy(
        _md5_mod(F.col("event_id").cast("string"), JK_BLOCKS).alias("block")
    ).agg(F.count("*").alias("n_b"), F.sum("value").alias("s_b"))
    t = b.agg(
        F.sum("n_b").alias("n"),
        F.sum("s_b").alias("s"),
        F.count("*").alias("nb"),
    )
    th = b.crossJoin(F.broadcast(t)).select(
        ((F.col("s") - F.col("s_b")) / (F.col("n") - F.col("n_b"))).alias(
            "theta"
        ),
        "n",
        "s",
        "nb",
    )
    tb = th.agg(F.avg("theta").alias("tbar"))
    v = (
        th.crossJoin(F.broadcast(tb))
        .agg(
            F.any_value("n").alias("n"),
            F.any_value("s").alias("s"),
            F.any_value("nb").alias("nb"),
            F.sum(
                (F.col("theta") - F.col("tbar"))
                * (F.col("theta") - F.col("tbar"))
            ).alias("ssq"),
        )
    )
    mean = F.col("s") / F.col("n")
    se = F.sqrt((F.col("nb") - 1.0) / F.col("nb") * F.col("ssq"))
    return v.select(
        F.round(mean, 4).alias("mean_value"),
        F.round(se, 6).alias("se_jack"),
        F.round(mean - 1.96 * se, 4).alias("ci_lo"),
        F.round(mean + 1.96 * se, 4).alias("ci_hi"),
    )


# ------------------------------------------------------- confusion_report


@query(
    "confusion_report",
    f"""
    WITH c AS (
      SELECT o_orderpriority AS priority,
             CAST(sum(CASE WHEN o_totalprice >= {CONF_THRESHOLD}
                            AND o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS tp,
             CAST(sum(CASE WHEN o_totalprice >= {CONF_THRESHOLD}
                            AND o_orderstatus <> 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS fp,
             CAST(sum(CASE WHEN o_totalprice < {CONF_THRESHOLD}
                            AND o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS fn,
             CAST(sum(CASE WHEN o_totalprice < {CONF_THRESHOLD}
                            AND o_orderstatus <> 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS tn
      FROM orders GROUP BY 1)
    SELECT priority, tp, fp, fn, tn,
           round(tp * 1.0 / NULLIF(tp + fp, 0), 6) AS precision_,
           round(tp * 1.0 / NULLIF(tp + fn, 0), 6) AS recall_,
           round(2.0 * tp / NULLIF(2 * tp + fp + fn, 0), 6) AS f1
    FROM c
    """,
)
def confusion_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority confusion matrix + precision/recall/F1 for the
    fixed decision rule price ≥ {CONF_THRESHOLD} predicting a finalized
    order — the batch model-evaluation readout. Four conditional sums
    in ONE hash aggregation over one scan (map-side partials, O(groups)
    network); the derived metrics are arithmetic on exact integers, so
    cross-engine floats are bit-identical before rounding. F1 uses the
    2tp/(2tp+fp+fn) form — algebraically the harmonic mean but defined
    (NULL) exactly when tp+fp or tp+fn is empty, matching NULLIF on
    both engines. Trailing underscores: `precision` is reserved-ish in
    some engines; one name both sides keeps the hash contract."""
    o = load_table(spark, "orders", sf_dir)
    pred = F.col("o_totalprice") >= CONF_THRESHOLD
    lab = F.col("o_orderstatus") == "F"
    c = o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.sum(F.when(pred & lab, 1).otherwise(0)).alias("tp"),
        F.sum(F.when(pred & ~lab, 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~pred & lab, 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~pred & ~lab, 1).otherwise(0)).alias("tn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return c.select(
        "priority", "tp", "fp", "fn", "tn",
        F.round(tp * 1.0 / F.nullif(tp + fp, F.lit(0)), 6).alias("precision_"),
        F.round(tp * 1.0 / F.nullif(tp + fn, F.lit(0)), 6).alias("recall_"),
        F.round(
            2.0 * tp / F.nullif(2 * tp + fp + fn, F.lit(0)), 6
        ).alias("f1"),
    )


# ------------------------------------------------------ lift_band_report


@query(
    "lift_band_report",
    f"""
    WITH mm AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
                FROM orders),
    g AS (
      SELECT {_bin_sql('o_totalprice')} AS band,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum({_LABEL_SQL}) AS BIGINT) AS pos
      FROM orders CROSS JOIN mm GROUP BY 1),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS tot_n,
                 CAST(sum(pos) AS BIGINT) AS tot_pos FROM g)
    SELECT band, n,
           round(pos * 1.0 / n, 6) AS response_rate,
           round((pos * 1.0 / n) / (tot_pos * 1.0 / tot_n), 6) AS lift,
           round(sum(pos) OVER (ORDER BY band DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 * 1.0 / tot_pos, 6) AS cum_capture
    FROM g CROSS JOIN t
    """,
)
def lift_band_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-band lift table: {N_BINS} equal-width price bands, each
    with its positive-response rate, lift over the base rate, and the
    cumulative share of positives captured scanning from the top band
    down — the campaign-targeting readout ("top 20% of scores capture
    X% of conversions"). One conditional agg collapses the table to
    {N_BINS} band rows; base-rate scalars broadcast back; the
    cumulative window runs over {N_BINS} rows. All counts integer-exact
    → float metrics bit-identical cross-engine before round(6)."""
    o = load_table(spark, "orders", sf_dir)
    mm = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    g = (
        o.crossJoin(F.broadcast(mm))
        .groupBy(
            _bin_col(F.col("o_totalprice"), F.col("lo"), F.col("hi")).alias(
                "band"
            )
        )
        .agg(F.count("*").alias("n"), F.sum(_label()).alias("pos"))
    )
    t = g.agg(F.sum("n").alias("tot_n"), F.sum("pos").alias("tot_pos"))
    wcum = Window.orderBy(F.desc("band")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rate = F.col("pos") * 1.0 / F.col("n")
    base = F.col("tot_pos") * 1.0 / F.col("tot_n")
    return g.crossJoin(F.broadcast(t)).select(
        "band",
        "n",
        F.round(rate, 6).alias("response_rate"),
        F.round(rate / base, 6).alias("lift"),
        F.round(
            F.sum("pos").over(wcum) * 1.0 / F.col("tot_pos"), 6
        ).alias("cum_capture"),
    )


# ------------------------------------------------------------- ttest_welch

# Cross-engine-exact moment contract (r6 kernel purge, hardened r7 per
# ADVICE): avg/var_samp kernels accumulate doubles in engine/build-
# specific order, so their trailing ulps can flip a round() boundary in
# the driver environment even when every local sweep is green. Instead:
# quantize value to the 1e-4 grid — LOSSLESS on this 2-decimal data and
# two orders more int64 headroom than the old 1e-6 grid (|value| safe to
# ~3e5 before vq^2 passes 2^63; the old grid silently wrapped Spark-side
# past |value|~3037 because the multiply ran in BIGINT before the
# DECIMAL cast — the r6 ADVICE finding). Moments are exact int64 sums,
# the second moment through the hi/lo carrier (functions/exactagg.py) so
# NO wide-integer type appears on either engine (the DECIMAL(38,0) vs
# HUGEINT ->double conversions are not the same rounding past 2^63);
# mean/variance/t/df derive in ONE shared double expression. Degenerate
# arms (n<2, zero variance) take shared CASE guards instead of the
# engines' divide-by-zero split (Spark non-ANSI NULL vs DuckDB inf).
_TT_VQ = "CAST(floor(value * 1e4 + 0.5) AS BIGINT)"
_TT_N = "CAST(count(vq) AS DOUBLE)"
_TT_SX = "CAST(CAST(sum(vq) AS BIGINT) AS DOUBLE)"
_TT_SXX = hilo_sum_sql("vq * vq")
_TT_MEAN = f"({_TT_SX} / ({_TT_N} * 1e4))"
_TT_VAR = (
    f"(({_TT_N} * {_TT_SXX} - {_TT_SX} * {_TT_SX})"
    f" / ({_TT_N} * ({_TT_N} - 1.0)) / 1e8)"
)
# post-pivot scalar expressions (identical doubles in, identical text):
_TT_SE = "(v1 / n_click + v2 / n_view)"
_TT_OK = f"(n_click > 1 AND n_view > 1 AND {_TT_SE} > 0.0)"
_TT_TSTAT = (
    f"CASE WHEN {_TT_OK} THEN "
    f"floor((m1 - m2) / sqrt{_TT_SE} * 1e4 + 0.5) / 1e4 END"
)
_TT_DF = (
    f"CASE WHEN {_TT_OK} AND (v1 > 0.0 OR v2 > 0.0) THEN "
    f"floor({_TT_SE} * {_TT_SE}"
    f" / ((v1 / n_click) * (v1 / n_click) / (n_click - 1)"
    f"    + (v2 / n_view) * (v2 / n_view) / (n_view - 1)) * 1e2 + 0.5) / 1e2"
    " END"
)


@query(
    "ttest_welch",
    f"""
    WITH q AS (
      SELECT event_type, {_TT_VQ} AS vq
      FROM events WHERE event_type IN ('click', 'view')),
    g AS (
      SELECT event_type,
             CAST(count(vq) AS BIGINT) AS n,
             {_TT_MEAN} AS m,
             {_TT_VAR} AS v
      FROM q GROUP BY 1),
    p AS (
      SELECT a.n AS n_click, b.n AS n_view,
             a.m AS m1, b.m AS m2, a.v AS v1, b.v AS v2
      FROM g a JOIN g b
        ON a.event_type = 'click' AND b.event_type = 'view')
    SELECT n_click, n_view,
           floor(m1 * 1e4 + 0.5) / 1e4 AS mean_click,
           floor(m2 * 1e4 + 0.5) / 1e4 AS mean_view,
           {_TT_TSTAT} AS t_stat,
           {_TT_DF} AS df_welch
    FROM p
    """,
)
def ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test comparing mean event value
    between 'click' and 'view' — the continuous-metric companion to
    `ab_test_readout`'s two-proportion z. One conditional scan computes
    both groups' (n, Σvq, Σvq²) moments; the t statistic and the
    Welch–Satterthwaite df are arithmetic on the resulting 2-row table.
    The arms pivot via a self-join of the 2-row aggregate (broadcast;
    the oracle spells the identical join) so the query stays one data
    shuffle. Means floor-round to 4dp, df to 2dp.

    Cross-engine contract (r6, hardened r7): NO avg/var_samp kernels —
    values are quantized on the lossless 1e-4 grid, the moments summed
    as exact int64 (second moment via the hi/lo carrier, so no
    DECIMAL/HUGEINT wide type on either engine), and mean/variance/t/df
    derived by shared double expressions (module constants above, same
    text in the oracle) — bit-identical across engines by construction,
    with shared CASE guards on degenerate arms. The E[x²]-form is safe
    HERE because it is exact integer arithmetic up to the one final
    double conversion; it is only cancellation-prone when accumulated
    in floats."""
    e = load_table(spark, "events", sf_dir)
    g = (
        e.filter(F.col("event_type").isin("click", "view"))
        .select("event_type", F.expr(_TT_VQ).alias("vq"))
        .groupBy("event_type")
        .agg(
            F.count("vq").alias("n"),
            F.expr(_TT_MEAN).alias("m"),
            F.expr(_TT_VAR).alias("v"),
        )
    )
    a = g.filter(F.col("event_type") == "click").select(
        F.col("n").alias("n_click"), F.col("m").alias("m1"),
        F.col("v").alias("v1"),
    )
    b = g.filter(F.col("event_type") == "view").select(
        F.col("n").alias("n_view"), F.col("m").alias("m2"),
        F.col("v").alias("v2"),
    )
    p = a.crossJoin(F.broadcast(b))
    return p.select(
        "n_click",
        "n_view",
        F.expr("floor(m1 * 1e4 + 0.5) / 1e4").alias("mean_click"),
        F.expr("floor(m2 * 1e4 + 0.5) / 1e4").alias("mean_view"),
        F.expr(_TT_TSTAT).alias("t_stat"),
        F.expr(_TT_DF).alias("df_welch"),
    )


# ------------------------------------------------------ mutual_information


@query(
    "mutual_information",
    f"""
    WITH mm AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
    cells AS (
      SELECT event_type, {_bin_sql('value')} AS bin,
             CAST(count(*) AS BIGINT) AS n_xy
      FROM events CROSS JOIN mm GROUP BY 1, 2),
    x AS (
      SELECT event_type, bin, n_xy,
             sum(n_xy) OVER (PARTITION BY event_type) AS nx,
             sum(n_xy) OVER (PARTITION BY bin) AS ny,
             sum(n_xy) OVER () AS n
      FROM cells)
    SELECT event_type, bin, n_xy,
           round((n_xy * 1.0 / n)
                 * ln((n_xy * 1.0 / n)
                      / ((nx * 1.0 / n) * (ny * 1.0 / n))), 6) AS mi_term
    FROM x
    """,
)
def mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information cells between event type and the value's
    equal-width bin — "does this categorical feature carry signal about
    the metric?", the information-theoretic sibling of
    `chi2_independence` and the PMI the text family computes for word
    pairs. Identical scale shape to chi2: one conditional agg collapses
    rows to the |types|×|bins| contingency table; marginals are windows
    over those ~50 cells. Σ mi_term = MI ≥ 0 (only occupied cells
    contribute — empty cells add exactly 0 to MI). Probabilities derive
    from integer counts by identical divisions, so the floats agree
    bit-for-bit before round(6)."""
    e = load_table(spark, "events", sf_dir)
    mm = e.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    cells = (
        e.crossJoin(F.broadcast(mm))
        .groupBy(
            "event_type",
            _bin_col(F.col("value"), F.col("lo"), F.col("hi")).alias("bin"),
        )
        .agg(F.count("*").alias("n_xy"))
    )
    unb = (Window.unboundedPreceding, Window.unboundedFollowing)
    x = cells.select(
        "event_type",
        "bin",
        "n_xy",
        F.sum("n_xy")
        .over(Window.partitionBy("event_type").rowsBetween(*unb))
        .alias("nx"),
        F.sum("n_xy")
        .over(Window.partitionBy("bin").rowsBetween(*unb))
        .alias("ny"),
        F.sum("n_xy").over(Window.rowsBetween(*unb)).alias("n"),
    )
    pxy = F.col("n_xy") * 1.0 / F.col("n")
    px = F.col("nx") * 1.0 / F.col("n")
    py = F.col("ny") * 1.0 / F.col("n")
    return x.select(
        "event_type",
        "bin",
        "n_xy",
        F.round(pxy * F.log(pxy / (px * py)), 6).alias("mi_term"),
    )


# ------------------------------------------------------------- cramers_v


@query(
    "cramers_v",
    """
    WITH cells AS (
      SELECT c.c_mktsegment AS segment, o.o_orderstatus AS status,
             CAST(count(*) AS BIGINT) AS obs
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    x AS (
      SELECT obs,
             sum(obs) OVER (PARTITION BY segment) AS rt,
             sum(obs) OVER (PARTITION BY status) AS ct,
             sum(obs) OVER () AS n
      FROM cells),
    s AS (
      SELECT any_value(n) AS n,
             sum((obs - rt * 1.0 * ct / n) * (obs - rt * 1.0 * ct / n)
                 / (rt * 1.0 * ct / n)) AS chi2,
             count(*) AS n_cells
      FROM x),
    d AS (
      SELECT CAST(count(DISTINCT segment) AS BIGINT) AS r,
             CAST(count(DISTINCT status) AS BIGINT) AS c
      FROM cells)
    SELECT CAST(s.n AS BIGINT) AS n,
           round(s.chi2, 4) AS chi2,
           CAST((d.r - 1) * (d.c - 1) AS BIGINT) AS dof,
           round(sqrt(s.chi2 / (s.n * LEAST(d.r - 1, d.c - 1))), 6)
             AS cramers_v
    FROM s CROSS JOIN d
    """,
)
def cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size for segment × status — the [0,1]-scaled
    summary of `chi2_independence` that's comparable across tables of
    different shapes (V = √(χ²/(n·min(r−1,c−1)))). Same O(cells)
    marginal windows; the χ² reduction then runs over ~15 cells, and
    the (r, c) dimensions come from a distinct-count over the SAME tiny
    cell table — no second scan of the fact join anywhere."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    cells = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            o.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(F.count("*").alias("obs"))
    )
    unb = (Window.unboundedPreceding, Window.unboundedFollowing)
    x = cells.select(
        "obs",
        F.sum("obs")
        .over(Window.partitionBy("segment").rowsBetween(*unb))
        .alias("rt"),
        F.sum("obs")
        .over(Window.partitionBy("status").rowsBetween(*unb))
        .alias("ct"),
        F.sum("obs").over(Window.rowsBetween(*unb)).alias("n"),
    )
    e = F.col("rt") * 1.0 * F.col("ct") / F.col("n")
    s = x.agg(
        F.any_value("n").alias("n"),
        F.sum((F.col("obs") - e) * (F.col("obs") - e) / e).alias("chi2"),
    )
    d = cells.agg(
        F.count_distinct("segment").alias("r"),
        F.count_distinct("status").alias("c"),
    )
    rr, cc = F.col("r"), F.col("c")
    return s.crossJoin(F.broadcast(d)).select(
        F.col("n").cast("bigint").alias("n"),
        F.round("chi2", 4).alias("chi2"),
        ((rr - 1) * (cc - 1)).cast("bigint").alias("dof"),
        F.round(
            F.sqrt(F.col("chi2") / (F.col("n") * F.least(rr - 1, cc - 1))), 6
        ).alias("cramers_v"),
    )


# ------------------------------------------------------- hhi_concentration


@query(
    "hhi_concentration",
    """
    WITH rev AS (
      SELECT s.s_nationkey AS nationkey, l.l_suppkey AS suppkey,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS rev
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2),
    sh AS (
      SELECT nationkey, rev,
             rev / sum(rev) OVER (PARTITION BY nationkey) AS share
      FROM rev)
    SELECT nationkey,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           round(sum(share * share), 6) AS hhi,
           round(max(share), 6) AS top_share
    FROM sh GROUP BY nationkey
    """,
)
def hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of supplier revenue within
    each nation — "is this market dominated by few players?" (HHI =
    Σ shareᵢ², 1/n for perfect competition → 1 for monopoly; top_share
    alongside for interpretability). Per-supplier revenue aggregates
    first (the only data-sized shuffle; the supplier dim broadcasts),
    is QUANTIZED to the 4dp grid so both engines' share divisions start
    from identical bits, and the share normalization is a window over
    the per-(nation, supplier) lattice — bounded by supplier count, not
    lineitem count. The squared-share sum collapses to one row per
    nation."""
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    rev = (
        li.join(
            F.broadcast(s.select("s_suppkey", "s_nationkey")),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy(
            F.col("s_nationkey").alias("nationkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("rev")
        )
    )
    wn = Window.partitionBy("nationkey").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sh = rev.select(
        "nationkey", (F.col("rev") / F.sum("rev").over(wn)).alias("share")
    )
    return sh.groupBy("nationkey").agg(
        F.count("*").alias("n_suppliers"),
        F.round(F.sum(F.col("share") * F.col("share")), 6).alias("hhi"),
        F.round(F.max("share"), 6).alias("top_share"),
    )


# ------------------------------------------------------ quantile_normalize


@query(
    "quantile_normalize",
    """
    WITH g AS (
      SELECT event_type, value,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT event_type, value, n,
             COALESCE(sum(n) OVER (PARTITION BY event_type ORDER BY value
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS cumb,
             sum(n) OVER (PARTITION BY event_type) AS tot
      FROM g)
    SELECT event_type, value,
           round((cumb + (n + 1) / 2.0) / (tot + 1), 6) AS qrank
    FROM r
    """,
)
def quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group midrank quantile transform — map every value to its
    empirical CDF position in (0, 1) via the Van der Waerden
    convention midrank/(N+1) — strictly inside the open interval, so an
    inverse-normal transform downstream never sees ±inf; ties share
    their midrank so the transform is permutation-invariant.
    Same lattice discipline as `roc_auc`: the table collapses to
    (group, distinct-value, n) first, the cumulative window runs over
    the LATTICE, and the output is the value→qrank LOOKUP TABLE —
    that's what production materializes and broadcast-joins onto the
    fact table (re-emitting per-row ranks would just inflate the
    output). Integer counts throughout; one float division at the end.
    """
    e = load_table(spark, "events", sf_dir)
    g = e.groupBy("event_type", "value").agg(F.count("*").alias("n"))
    wb = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wt = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = g.select(
        "event_type",
        "value",
        "n",
        F.coalesce(F.sum("n").over(wb), F.lit(0).cast("bigint")).alias(
            "cumb"
        ),
        F.sum("n").over(wt).alias("tot"),
    )
    return r.select(
        "event_type",
        "value",
        F.round(
            (F.col("cumb") + (F.col("n") + 1) / 2.0) / (F.col("tot") + 1), 6
        ).alias("qrank"),
    )


# --------------------------------------------------------- winsorize_clip


WINS_LO, WINS_HI = 0.01, 0.99


@query(
    "winsorize_clip",
    f"""
    WITH cuts AS (
      SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, {WINS_LO}), 4) AS lo_cut,
             round(quantile_cont(l_extendedprice, {WINS_HI}), 4) AS hi_cut
      FROM lineitem GROUP BY 1)
    SELECT l.l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN l.l_extendedprice < c.lo_cut
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
           CAST(sum(CASE WHEN l.l_extendedprice > c.hi_cut
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
           round(avg(l.l_extendedprice), 4) AS mean_raw,
           round(avg(LEAST(GREATEST(l.l_extendedprice, c.lo_cut),
                           c.hi_cut)), 4) AS mean_winsor
    FROM lineitem l JOIN cuts c ON l.l_returnflag = c.l_returnflag
    GROUP BY l.l_returnflag
    """,
)
def winsorize_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization report per group: clip the price at the exact
    p{int(WINS_LO * 100)}/p{int(WINS_HI * 100)} cutoffs and compare the
    raw vs winsorized mean — the outlier-robust preprocessing step
    (complement of `outlier_mad`, which FLAGS; this one CLIPS). Cutoffs
    come from one exact-percentile agg per group (a handful of rows),
    are ROUNDED to the 4dp grid BEFORE any comparison — both engines
    then clip against literally identical cut values, so a boundary row
    can't land on different sides of an ULP — and broadcast back onto
    the fact scan. Two shuffles total (cuts agg + final agg); the clip
    itself is map-side least/greatest, codegen-resident. At 100 TB the
    exact percentile swaps for approx_percentile (documented on
    `exact_percentiles`) without touching the clip plumbing."""
    # spread() the projected fact input (optimization r10): exact
    # percentile's update phase (per-row sorted-buffer insert) is the
    # dominant cost and the single-row-group parquet scan runs it on ONE
    # task — measured 3.4 s -> 1.8 s for the cuts aggregate alone with a
    # 32-way fan-out of the two needed columns. Both consumers (cuts and
    # the final clip aggregate) read the same spread projection. The 4dp
    # round on every float aggregate already absorbs the partial-agg
    # order change, the same tolerance the query was built on.
    li = spread(
        load_table(spark, "lineitem", sf_dir).select(
            "l_returnflag", "l_extendedprice"
        )
    )
    cuts = li.groupBy("l_returnflag").agg(
        F.round(
            F.expr(f"percentile(l_extendedprice, {WINS_LO})"), 4
        ).alias("lo_cut"),
        F.round(
            F.expr(f"percentile(l_extendedprice, {WINS_HI})"), 4
        ).alias("hi_cut"),
    )
    x = F.col("l_extendedprice")
    clipped = F.least(F.greatest(x, F.col("lo_cut")), F.col("hi_cut"))
    return (
        li.join(F.broadcast(cuts), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(x < F.col("lo_cut"), 1).otherwise(0)).alias(
                "n_clip_lo"
            ),
            F.sum(F.when(x > F.col("hi_cut"), 1).otherwise(0)).alias(
                "n_clip_hi"
            ),
            F.round(F.avg(x), 4).alias("mean_raw"),
            F.round(F.avg(clipped), 4).alias("mean_winsor"),
        )
    )


# ---------------------------------------------------------------------------
# Poisson-bootstrap confidence interval (deterministic hash replicates)
# ---------------------------------------------------------------------------
BOOT_R = 32  # replicates
# Poisson(1) inverse-CDF thresholds (cumulative probabilities): a
# hash-uniform u maps to weight w = #occurrences of the row in the
# replicate. Tail capped at 4 (P(X>=5) ~ 0.37%): the cap biases each
# replicate's size by <0.004 rows per row — far inside bootstrap noise.
_POIS_C = (0.3678794412, 0.7357588823, 0.9196986029, 0.9810118431)


@query(
    "bootstrap_ci_poisson",
    f"""
    WITH reps AS (SELECT unnest(range({BOOT_R})) AS rep),
    w AS (
      SELECT event_type, value, rep,
             CASE
               WHEN u < {_POIS_C[0]} THEN 0
               WHEN u < {_POIS_C[1]} THEN 1
               WHEN u < {_POIS_C[2]} THEN 2
               WHEN u < {_POIS_C[3]} THEN 3
               ELSE 4 END AS w
      FROM (SELECT event_type, value, rep,
                   ((('0x' || substr(md5(event_id::VARCHAR || ':' || rep::VARCHAR), 1, 8))::BIGINT)
                    / 4294967296.0) AS u
            FROM events, reps)
    ),
    m AS (
      SELECT event_type, rep,
             round(sum(w * value) / sum(w), 4) AS mr
      FROM w GROUP BY event_type, rep
    ),
    pt AS (
      SELECT event_type, round(avg(value), 4) AS mean_value
      FROM events GROUP BY event_type
    )
    SELECT m.event_type, any_value(pt.mean_value) AS mean_value,
           round(quantile_cont(mr, 0.025), 4) AS ci_lo,
           round(quantile_cont(mr, 0.975), 4) AS ci_hi,
           count(*)::BIGINT AS n_replicates
    FROM m JOIN pt USING (event_type)
    GROUP BY m.event_type
    """,
)
def bootstrap_ci_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap CI for the per-type mean value via the POISSON
    bootstrap (Chamandy et al., 2012 — the large-scale form: each row
    independently enters replicate r with weight ~ Poisson(1), so no
    resampling shuffle ever happens). Weights are the Poisson(1)
    inverse-CDF of the md5 hash-uniform of (event_id, rep) — the
    engine's single deterministic-randomness convention (hash_unif) —
    so both engines draw IDENTICAL replicates and the CI is fully
    value-hash-checked (vs `jackknife_ci`'s delete-one-block variance:
    bootstrap also captures skewness, and replicates scale to streams).

    Shape at 100 TB: the {BOOT_R}x replicate fan-out is map-side only —
    weighted partials collapse to |types| x {BOOT_R} rows before the
    exchange; the percentile runs on a {BOOT_R}-value lattice per type.
    """
    from .curation import hash_unif

    ev = spread(load_table(spark, "events", sf_dir))
    reps = F.explode(F.sequence(F.lit(0), F.lit(BOOT_R - 1))).alias("rep")
    base = ev.select("event_type", "value", "event_id").select(
        "event_type", "value", "event_id", reps
    )
    u = hash_unif(
        F.concat_ws(
            ":", F.col("event_id").cast("string"), F.col("rep").cast("string")
        )
    )
    w = (
        F.when(u < _POIS_C[0], 0)
        .when(u < _POIS_C[1], 1)
        .when(u < _POIS_C[2], 2)
        .when(u < _POIS_C[3], 3)
        .otherwise(4)
    )
    weighted = base.select("event_type", "rep", (w * F.col("value")).alias("wv"), w.alias("w"))
    m = weighted.groupBy("event_type", "rep").agg(
        F.round(F.sum("wv") / F.sum("w"), 4).alias("mr")
    )
    pt = ev.groupBy("event_type").agg(F.round(F.avg("value"), 4).alias("mean_value"))
    return (
        m.join(F.broadcast(pt), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("mean_value").alias("mean_value"),
            F.round(F.expr("percentile(mr, 0.025)"), 4).alias("ci_lo"),
            F.round(F.expr("percentile(mr, 0.975)"), 4).alias("ci_hi"),
            F.count("*").alias("n_replicates"),
        )
    )


# ---------------------------------------------------------------------------
# Sequential testing — Wald's SPRT over the daily event stream
# ---------------------------------------------------------------------------
SPRT_P0 = 0.18    # H0 click share
SPRT_P1 = 0.21    # H1 click share; true rate ~0.20 sits inside (p0,p1),
                  # so evidence accrues SLOWLY: the trajectory shows real
                  # 'continue' days before crossing at every sf (verified
                  # sf0.001: day 30, sf0.01: day 5, sf0.1: day 2)
SPRT_ALPHA = 0.05
SPRT_BETA = 0.05


@query(
    "sprt_sequential_test",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_ts,
             count(*) AS n,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_succ
      FROM events GROUP BY 1
    ),
    llr AS (
      SELECT day_ts, n, n_succ,
             n_succ * ln({SPRT_P1} / {SPRT_P0})
               + (n - n_succ) * ln((1 - {SPRT_P1}) / (1 - {SPRT_P0})) AS d_llr
      FROM daily
    ),
    cum AS (
      SELECT day_ts, n, n_succ,
             sum(d_llr) OVER (ORDER BY day_ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_llr
      FROM llr
    ),
    lab AS (
      SELECT day_ts, n, n_succ, cum_llr,
             CASE WHEN cum_llr >= ln((1 - {SPRT_BETA}) / {SPRT_ALPHA})
                    THEN 'accept_h1'
                  WHEN cum_llr <= ln({SPRT_BETA} / (1 - {SPRT_ALPHA}))
                    THEN 'accept_h0'
                  ELSE 'continue' END AS decision
      FROM cum
    )
    SELECT day_ts, n, n_succ, round(cum_llr, 6) AS cum_llr, decision,
           max(CASE WHEN decision <> 'continue' THEN 1 ELSE 0 END)
             OVER (ORDER BY day_ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
             AS stopped
    FROM lab
    """,
)
def sprt_sequential_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test on the daily event
    stream: cumulative log-likelihood ratio for H1 (click share
    {SPRT_P1}) vs H0 ({SPRT_P0}), with the classic
    ln((1-β)/α) / ln(β/(1-α)) decision boundaries — the always-valid
    monitor that lets an experiment STOP the first day the evidence
    crosses a boundary instead of waiting for a fixed horizon (the
    sequential complement to the fixed-horizon `ttest_welch` /
    `ab_test_readout`). `stopped` carries the stop-at-first-crossing
    semantics forward so post-decision days are marked.

    Scale shape: the raw stream collapses to the DAY lattice in one
    map-side-combined aggregate (daily LLR is exact integer counts ×
    two ln() constants); the running sum and the stop flag are windows
    over the bounded day grid, never raw rows. FP parity: both engines
    accumulate identical doubles in identical day order, so the
    UNROUNDED boundary comparisons agree bit-for-bit; only the reported
    cum_llr is rounded."""
    e = load_table(spark, "events", sf_dir)
    daily = (
        e.select(
            F.date_trunc("day", F.col("ts")).alias("day_ts"),
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("s"),
        )
        .groupBy("day_ts")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("s").alias("n_succ"))
    )
    import math

    w1 = math.log(SPRT_P1 / SPRT_P0)
    w0 = math.log((1 - SPRT_P1) / (1 - SPRT_P0))
    a_bound = math.log((1 - SPRT_BETA) / SPRT_ALPHA)
    b_bound = math.log(SPRT_BETA / (1 - SPRT_ALPHA))
    llr = daily.withColumn(
        "d_llr", F.col("n_succ") * F.lit(w1) + (F.col("n") - F.col("n_succ")) * F.lit(w0)
    )
    w_run = Window.orderBy("day_ts").rowsBetween(Window.unboundedPreceding, 0)
    cum = llr.withColumn("cum_llr", F.sum("d_llr").over(w_run))
    lab = cum.withColumn(
        "decision",
        F.when(F.col("cum_llr") >= a_bound, "accept_h1")
        .when(F.col("cum_llr") <= b_bound, "accept_h0")
        .otherwise("continue"),
    )
    return lab.select(
        "day_ts",
        "n",
        "n_succ",
        F.round("cum_llr", 6).alias("cum_llr"),
        "decision",
        (
            F.max(F.when(F.col("decision") != "continue", 1).otherwise(0)).over(w_run)
            == 1
        ).alias("stopped"),
    )


# --------------------------------------------------------------- emd_drift


@query(
    "emd_drift",
    f"""
    WITH mm AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
    g0 AS (
      SELECT {_bin_sql('value')} AS bin,
             CAST(sum(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1,
             CAST(sum(CASE WHEN day(ts) > 15 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n2
      FROM events CROSS JOIN mm GROUP BY 1),
    -- FULL bin lattice: a bin empty in BOTH halves still carries a
    -- nonzero |F1-F2| term whenever the CDF gap persists across it —
    -- dropping the row (as a bare GROUP BY does) under-counts W1
    g AS (
      SELECT b.bin, coalesce(g0.n1, 0) AS n1, coalesce(g0.n2, 0) AS n2
      FROM (SELECT unnest(range(0, {N_BINS})) AS bin) b
      LEFT JOIN g0 USING (bin)),
    t AS (SELECT sum(n1) AS t1, sum(n2) AS t2 FROM g),
    c AS (
      SELECT bin,
             n1 * 1.0 / t1 AS p_ref,
             n2 * 1.0 / t2 AS p_cur,
             sum(n1 * 1.0 / t1) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
             sum(n2 * 1.0 / t2) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f2
      FROM g CROSS JOIN t)
    SELECT bin, round(p_ref, 6) AS p_ref, round(p_cur, 6) AS p_cur,
           round(abs(f1 - f2), 6) AS cdf_gap,
           round(abs(f1 - f2) * (SELECT (hi - lo) / {N_BINS} FROM mm), 6)
             AS emd_term
    FROM c
    """,
)
def emd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein (earth-mover) drift between the first and second
    half of the month on the SAME shared binning as `psi_drift`:
    W₁ = Σ_bins |F_ref − F_cur| · Δ, the integral of CDF gaps. The
    metric drift triple is now complete — PSI (symmetrized KL,
    mass-ratio sensitive), KS (max CDF gap, location sensitive), EMD
    (CDF gap INTEGRAL, in value units — the only one that knows HOW FAR
    mass moved, which is what makes a 2-bin shift worse than a
    neighboring-bin wobble).

    Scale shape: identical to psi_drift — one conditional aggregation
    over one scan, min/max broadcast; the CDF accumulations are windows
    over the {N_BINS}-row bin lattice. FP parity: both engines cumulate
    identical n/t doubles in identical bin order, so the unrounded CDFs
    agree bit-for-bit; outputs rounded at 6."""
    e = load_table(spark, "events", sf_dir)
    mm = e.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    g0 = (
        e.crossJoin(F.broadcast(mm))
        .groupBy(_bin_col(F.col("value"), F.col("lo"), F.col("hi")).alias("bin"))
        .agg(
            F.sum(F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0)).alias("n1"),
            F.sum(F.when(F.dayofmonth("ts") > 15, 1).otherwise(0)).alias("n2"),
        )
    )
    # full lattice: bins empty in both halves still emit their CDF-gap
    # term (review finding — 9 of 10 bins appeared on the fixture and
    # the missing bin's |F1-F2|·Δ was silently dropped from W₁)
    bins = spark.range(N_BINS).select(F.col("id").cast("bigint").alias("bin"))
    g = (
        bins.join(g0, "bin", "left")
        .select(
            "bin",
            F.coalesce("n1", F.lit(0)).alias("n1"),
            F.coalesce("n2", F.lit(0)).alias("n2"),
        )
    )
    t = g.agg(F.sum("n1").alias("t1"), F.sum("n2").alias("t2"))
    p1 = F.col("n1") * 1.0 / F.col("t1")
    p2 = F.col("n2") * 1.0 / F.col("t2")
    w_cdf = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    c = (
        g.crossJoin(F.broadcast(t))
        .withColumn("p_ref_raw", p1)
        .withColumn("p_cur_raw", p2)
        .withColumn("f1", F.sum("p_ref_raw").over(w_cdf))
        .withColumn("f2", F.sum("p_cur_raw").over(w_cdf))
        .crossJoin(F.broadcast(mm.select(((F.col("hi") - F.col("lo")) / N_BINS).alias("delta"))))
    )
    return c.select(
        "bin",
        F.round("p_ref_raw", 6).alias("p_ref"),
        F.round("p_cur_raw", 6).alias("p_cur"),
        F.round(F.abs(F.col("f1") - F.col("f2")), 6).alias("cdf_gap"),
        F.round(F.abs(F.col("f1") - F.col("f2")) * F.col("delta"), 6).alias("emd_term"),
    )


# =====================================================================
# Nonparametric & agreement statistics
#
# The rank-based / categorical-agreement battery that rounds out the
# parametric tests above (ttest_welch, chi2, regression_agg): Spearman
# and Kendall run entirely on the (quantity, discount) CONTINGENCY
# LATTICE — 50×11 cells per return flag, a size fixed by the column
# domains, not the row count — so the pair/rank math never touches raw
# rows. The same bounded-lattice discipline as roc_auc/ks_statistic.
# =====================================================================


@query(
    "spearman_corr",
    """
    WITH cells AS (
      SELECT l_returnflag AS flag, l_quantity AS x, l_discount AS y,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1, 2, 3),
    rx AS (
      SELECT flag, x,
             CAST(sum(n) AS BIGINT) AS nx,
             CAST(coalesce(sum(sum(n)) OVER (PARTITION BY flag ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cumb
      FROM cells GROUP BY flag, x),
    ry AS (
      SELECT flag, y,
             CAST(sum(n) AS BIGINT) AS ny,
             CAST(coalesce(sum(sum(n)) OVER (PARTITION BY flag ORDER BY y
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cumb
      FROM cells GROUP BY flag, y),
    j AS (
      SELECT c.flag, c.n,
             rx.cumb + (rx.nx + 1) / 2.0 AS rkx,
             ry.cumb + (ry.ny + 1) / 2.0 AS rky
      FROM cells c
      JOIN rx ON rx.flag = c.flag AND rx.x = c.x
      JOIN ry ON ry.flag = c.flag AND ry.y = c.y),
    s AS (
      SELECT flag,
             CAST(sum(n) AS BIGINT) AS nn,
             sum(n * rkx)       AS sx,
             sum(n * rky)       AS sy,
             sum(n * rkx * rkx) AS sxx,
             sum(n * rky * rky) AS syy,
             sum(n * rkx * rky) AS sxy
      FROM j GROUP BY flag)
    SELECT flag, nn AS n_rows,
           round((nn * sxy - sx * sy)
                 / (sqrt(nn * sxx - sx * sx) * sqrt(nn * syy - sy * sy)),
                 6) AS spearman_rho
    FROM s
    """,
)
def spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and discount per
    return flag — the monotone-association companion to
    `column_corr`'s Pearson. Classic Spearman ranks every row, an
    O(n log n) per-group sort that dies at 100 TB; here both columns
    have domain-bounded cardinality, so the ranking happens on the
    MARGINAL LATTICES instead: one hash agg collapses rows to
    (flag, qty, disc) cells, midranks come from cumulative-count
    windows over the ≤50-row x-lattice / ≤11-row y-lattice, and the
    weighted Pearson over cell ranks equals row-level Spearman exactly
    (every row in a cell shares the cell's midrank pair).

    FP parity: midranks are integers-plus-half (cumb + (n+1)/2), i.e.
    EXACT binary doubles, and every moment term is n·rank products of
    such values — partial-merge order cannot change the sums until far
    past 2^53, so both engines agree bit-for-bit before round(6)."""
    li = load_table(spark, "lineitem", sf_dir)
    cells = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").alias("x"),
        F.col("l_discount").alias("y"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wx = Window.partitionBy("flag").orderBy("x").rowsBetween(
        Window.unboundedPreceding, -1
    )
    rx = (
        cells.groupBy("flag", "x")
        .agg(F.sum("n").alias("nx"))
        .withColumn("cumb", F.coalesce(F.sum("nx").over(wx), F.lit(0)))
        .select("flag", "x", (F.col("cumb") + (F.col("nx") + 1) / 2.0).alias("rkx"))
    )
    wy = Window.partitionBy("flag").orderBy("y").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ry = (
        cells.groupBy("flag", "y")
        .agg(F.sum("n").alias("ny"))
        .withColumn("cumb", F.coalesce(F.sum("ny").over(wy), F.lit(0)))
        .select("flag", "y", (F.col("cumb") + (F.col("ny") + 1) / 2.0).alias("rky"))
    )
    j = cells.join(rx, ["flag", "x"]).join(ry, ["flag", "y"])
    s = j.groupBy("flag").agg(
        F.sum("n").alias("nn"),
        F.sum(F.col("n") * F.col("rkx")).alias("sx"),
        F.sum(F.col("n") * F.col("rky")).alias("sy"),
        F.sum(F.col("n") * F.col("rkx") * F.col("rkx")).alias("sxx"),
        F.sum(F.col("n") * F.col("rky") * F.col("rky")).alias("syy"),
        F.sum(F.col("n") * F.col("rkx") * F.col("rky")).alias("sxy"),
    )
    num = F.col("nn") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(F.col("nn") * F.col("sxx") - F.col("sx") * F.col("sx")) * F.sqrt(
        F.col("nn") * F.col("syy") - F.col("sy") * F.col("sy")
    )
    return s.select(
        "flag",
        F.col("nn").alias("n_rows"),
        F.round(num / den, 6).alias("spearman_rho"),
    )


# ------------------------------------------------------------ kendall_tau


@query(
    "kendall_tau",
    """
    WITH cells AS (
      SELECT l_returnflag AS flag, l_quantity AS x, l_discount AS y,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1, 2, 3),
    cd AS (
      SELECT a.flag,
             CAST(sum(CASE WHEN (a.x < b.x AND a.y < b.y)
                             OR (a.x > b.x AND a.y > b.y)
                      THEN a.n * b.n ELSE 0 END) // 2 AS BIGINT) AS conc,
             CAST(sum(CASE WHEN (a.x < b.x AND a.y > b.y)
                             OR (a.x > b.x AND a.y < b.y)
                      THEN a.n * b.n ELSE 0 END) // 2 AS BIGINT) AS disc
      FROM cells a JOIN cells b ON a.flag = b.flag
      GROUP BY a.flag),
    tx AS (
      SELECT flag, CAST(sum(nx * (nx - 1) / 2) AS BIGINT) AS ties_x
      FROM (SELECT flag, x, sum(n) AS nx FROM cells GROUP BY 1, 2)
      GROUP BY flag),
    ty AS (
      SELECT flag, CAST(sum(ny * (ny - 1) / 2) AS BIGINT) AS ties_y
      FROM (SELECT flag, y, sum(n) AS ny FROM cells GROUP BY 1, 2)
      GROUP BY flag),
    tot AS (
      SELECT flag, CAST(sum(n) AS BIGINT) AS nn FROM cells GROUP BY flag)
    SELECT t.flag, t.nn AS n_rows, cd.conc AS concordant,
           cd.disc AS discordant,
           round((cd.conc - cd.disc)
                 / (sqrt(CAST(t.nn * (t.nn - 1) / 2 - tx.ties_x AS DOUBLE))
                    * sqrt(CAST(t.nn * (t.nn - 1) / 2 - ty.ties_y AS DOUBLE))),
                 6) AS tau_b
    FROM tot t
    JOIN cd USING (flag) JOIN tx USING (flag) JOIN ty USING (flag)
    """,
)
def kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between quantity and discount per return flag —
    the pair-concordance view of the same association `spearman_corr`
    measures by rank. Naive Kendall is O(n²) row pairs (absurd at any
    scale); on domain-bounded columns the concordant/discordant counts
    factor through the contingency lattice: a symmetric self-join of
    the ≤550 cells per flag (≤300k cell pairs TOTAL, independent of row
    count) with n_a·n_b weights, halved to undo the double count. Tie
    corrections come from the two marginal lattices. Every intermediate
    is an exact int64 (products of counts): the double-counted pair-weight
    sums are even, halved with shiftright (Spark) / ``//`` (DuckDB) so no
    value ever routes through a double. Past ~2^63 total pair weight
    (n ~ 4B rows per flag) swap the sums to DECIMAL(38,0), as
    graph_assortativity documents; only tau itself is a rounded float."""
    li = load_table(spark, "lineitem", sf_dir)
    cells = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").alias("x"),
        F.col("l_discount").alias("y"),
    ).agg(F.count(F.lit(1)).alias("n"))
    a = cells.alias("a")
    b = cells.alias("b")
    pair = a.join(b, F.col("a.flag") == F.col("b.flag"))
    conc_w = F.when(
        ((F.col("a.x") < F.col("b.x")) & (F.col("a.y") < F.col("b.y")))
        | ((F.col("a.x") > F.col("b.x")) & (F.col("a.y") > F.col("b.y"))),
        F.col("a.n") * F.col("b.n"),
    ).otherwise(F.lit(0))
    disc_w = F.when(
        ((F.col("a.x") < F.col("b.x")) & (F.col("a.y") > F.col("b.y")))
        | ((F.col("a.x") > F.col("b.x")) & (F.col("a.y") < F.col("b.y"))),
        F.col("a.n") * F.col("b.n"),
    ).otherwise(F.lit(0))
    cd = pair.groupBy(F.col("a.flag").alias("flag")).agg(
        F.shiftright(F.sum(conc_w), 1).alias("conc"),
        F.shiftright(F.sum(disc_w), 1).alias("disc"),
    )
    tx = (
        cells.groupBy("flag", "x")
        .agg(F.sum("n").alias("nx"))
        .groupBy("flag")
        .agg(F.sum(F.col("nx") * (F.col("nx") - 1) / 2).cast("bigint").alias("ties_x"))
    )
    ty = (
        cells.groupBy("flag", "y")
        .agg(F.sum("n").alias("ny"))
        .groupBy("flag")
        .agg(F.sum(F.col("ny") * (F.col("ny") - 1) / 2).cast("bigint").alias("ties_y"))
    )
    tot = cells.groupBy("flag").agg(F.sum("n").alias("nn"))
    n0 = (F.col("nn") * (F.col("nn") - 1) / 2).cast("bigint")
    out = (
        tot.join(cd, "flag").join(tx, "flag").join(ty, "flag")
        .select(
            "flag",
            F.col("nn").alias("n_rows"),
            F.col("conc").alias("concordant"),
            F.col("disc").alias("discordant"),
            F.round(
                (F.col("conc") - F.col("disc"))
                / (
                    F.sqrt((n0 - F.col("ties_x")).cast("double"))
                    * F.sqrt((n0 - F.col("ties_y")).cast("double"))
                ),
                6,
            ).alias("tau_b"),
        )
    )
    return out


# ----------------------------------------------------------- anova_oneway


@query(
    "anova_oneway",
    """
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             sum(value)  AS s,
             sum(value * value) AS s2
      FROM events GROUP BY 1),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT)   AS nn,
             sum(s)  AS ts,
             sum(s2) AS ts2,
             sum(s * s / n) AS sgm
      FROM g)
    SELECT k AS n_groups, nn AS n_rows,
           round((sgm - ts * ts / nn) / (k - 1), 4)        AS ms_between,
           round((ts2 - sgm) / (nn - k), 4)                AS ms_within,
           round(((sgm - ts * ts / nn) / (k - 1))
                 / ((ts2 - sgm) / (nn - k)), 4)            AS f_stat,
           round((sgm - ts * ts / nn) / (ts2 - ts * ts / nn), 6)
                                                           AS eta_squared
    FROM t
    """,
)
def anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-test — does mean event value differ across the 5
    event types? Generalizes `ttest_welch` from 2 arms to k. The whole
    decomposition (SSB, SSW, F, η²) is algebra over per-group
    (n, Σx, Σx²) moment partials: ONE hash aggregation over one scan,
    map-side combinable, shuffling k tiny states — the ideal 100 TB
    aggregation shape, same as column_corr. The between/within split
    uses the Σ(s²/n) group-moment form so both engines run the
    identical expression tree; raw-double sum-order noise (~1e-12
    relative) is absorbed by round(4)/round(6).

    Reference provenance: generalizes the aggregate surface of
    cassandra_sink.scala:113-120 to the model-diagnostics side."""
    e = load_table(spark, "events", sf_dir)
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("s2"),
    )
    t = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("ts"),
        F.sum("s2").alias("ts2"),
        F.sum(F.col("s") * F.col("s") / F.col("n")).alias("sgm"),
    )
    ssb = F.col("sgm") - F.col("ts") * F.col("ts") / F.col("nn")
    ssw = F.col("ts2") - F.col("sgm")
    sst = F.col("ts2") - F.col("ts") * F.col("ts") / F.col("nn")
    return t.select(
        F.col("k").alias("n_groups"),
        F.col("nn").alias("n_rows"),
        F.round(ssb / (F.col("k") - 1), 4).alias("ms_between"),
        F.round(ssw / (F.col("nn") - F.col("k")), 4).alias("ms_within"),
        F.round((ssb / (F.col("k") - 1)) / (ssw / (F.col("nn") - F.col("k"))), 4).alias(
            "f_stat"
        ),
        F.round(ssb / sst, 6).alias("eta_squared"),
    )


# ----------------------------------------------------------- cohens_kappa


@query(
    "cohens_kappa",
    f"""
    WITH c AS (
      SELECT o_orderpriority AS priority,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN o_totalprice >= {CONF_THRESHOLD}
                            AND o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS both_pos,
             CAST(sum(CASE WHEN o_totalprice >= {CONF_THRESHOLD}
                      THEN 1 ELSE 0 END) AS BIGINT) AS a_pos,
             CAST(sum(CASE WHEN o_orderstatus = 'F'
                      THEN 1 ELSE 0 END) AS BIGINT) AS b_pos
      FROM orders GROUP BY 1)
    SELECT priority, n, both_pos, a_pos, b_pos,
           round((n - a_pos - b_pos + 2 * both_pos) * 1.0 / n, 6) AS p_obs,
           round((a_pos * 1.0 / n) * (b_pos * 1.0 / n)
                 + ((n - a_pos) * 1.0 / n) * ((n - b_pos) * 1.0 / n), 6)
             AS p_exp,
           round(((n - a_pos - b_pos + 2 * both_pos) * 1.0 / n
                  - ((a_pos * 1.0 / n) * (b_pos * 1.0 / n)
                     + ((n - a_pos) * 1.0 / n) * ((n - b_pos) * 1.0 / n)))
                 / (1 - ((a_pos * 1.0 / n) * (b_pos * 1.0 / n)
                     + ((n - a_pos) * 1.0 / n) * ((n - b_pos) * 1.0 / n))),
                 6) AS kappa
    FROM c
    """,
)
def cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa per order priority: chance-corrected agreement
    between the price-threshold classifier (price >= {CONF_THRESHOLD},
    the same decision rule as `confusion_report`) and the realized
    label (finalized). The 2×2 agreement table per group reduces to
    four conditional counts in ONE aggregation pass — p_observed,
    p_expected and kappa are pure arithmetic on those int64s, so both
    engines compute identical floats from identical integers before
    round(6). The degenerate guard (a rater with zero variance →
    p_exp = 1) cannot occur on this data: both raters have both classes
    in every priority, pinned in tests."""
    o = load_table(spark, "orders", sf_dir)
    a = F.when(F.col("o_totalprice") >= CONF_THRESHOLD, 1).otherwise(0)
    b = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    c = o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(a * b).alias("both_pos"),
        F.sum(a).alias("a_pos"),
        F.sum(b).alias("b_pos"),
    )
    po = (F.col("n") - F.col("a_pos") - F.col("b_pos") + 2 * F.col("both_pos")) * 1.0 / F.col("n")
    pe = (F.col("a_pos") * 1.0 / F.col("n")) * (F.col("b_pos") * 1.0 / F.col("n")) + (
        (F.col("n") - F.col("a_pos")) * 1.0 / F.col("n")
    ) * ((F.col("n") - F.col("b_pos")) * 1.0 / F.col("n"))
    return c.select(
        "priority",
        "n",
        "both_pos",
        "a_pos",
        "b_pos",
        F.round(po, 6).alias("p_obs"),
        F.round(pe, 6).alias("p_exp"),
        F.round((po - pe) / (1 - pe), 6).alias("kappa"),
    )


# ---------------------------------------------------------------- pr_auc


@query(
    "pr_auc",
    f"""
    WITH g AS (
      SELECT o_orderpriority AS priority, o_totalprice AS score,
             CAST(count(*) AS BIGINT)          AS n,
             CAST(sum({_LABEL_SQL}) AS BIGINT) AS npos
      FROM orders GROUP BY 1, 2),
    c AS (
      SELECT priority, n, npos,
             sum(npos) OVER (PARTITION BY priority ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
             sum(n) OVER (PARTITION BY priority ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
      FROM g),
    t AS (SELECT priority, CAST(sum(npos) AS BIGINT) AS pos,
                 CAST(sum(n) AS BIGINT) AS nn
          FROM g GROUP BY priority)
    SELECT c.priority, t.nn AS n_orders, t.pos AS n_pos,
           round(sum((npos * 1.0 / t.pos) * (tp * 1.0 / cum_n)), 6)
             AS average_precision
    FROM c JOIN t ON c.priority = t.priority
    GROUP BY c.priority, t.nn, t.pos
    """,
)
def pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (step-wise PR-AUC) per priority — the
    imbalance-robust companion to `roc_auc`: AP = Σ_thresholds
    ΔRecall · Precision, walking distinct scores high→low. Runs on the
    same (priority, score) lattice as roc_auc: one hash agg collapses
    rows to per-score (n, npos) counts; cumulative TP and predicted-
    positive counts are windows over the lattice (bounded by score
    cardinality, not row count); AP is one more aggregation of exact
    count ratios. Tied scores form one threshold block (the only
    self-consistent choice for both engines — they cumulate in
    identical DESC score order), so the floats match bit-for-bit
    before round(6)."""
    o = load_table(spark, "orders", sf_dir)
    g = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("score"),
    ).agg(F.count(F.lit(1)).alias("n"), F.sum(_label()).alias("npos"))
    w = Window.partitionBy("priority").orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = g.withColumn("tp", F.sum("npos").over(w)).withColumn(
        "cum_n", F.sum("n").over(w)
    )
    t = g.groupBy("priority").agg(
        F.sum("npos").alias("pos"), F.sum("n").alias("nn")
    )
    j = c.join(F.broadcast(t), "priority")
    return j.groupBy("priority", F.col("nn").alias("n_orders"), F.col("pos").alias("n_pos")).agg(
        F.round(
            F.sum((F.col("npos") * 1.0 / F.col("pos")) * (F.col("tp") * 1.0 / F.col("cum_n"))),
            6,
        ).alias("average_precision")
    )


# --------------------------------------------------------- log_loss_brier


P_EPS = 1e-6  # probability clamp for log-loss finiteness


@query(
    "log_loss_brier",
    f"""
    WITH mm AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
                FROM orders),
    p AS (
      SELECT o_orderpriority AS priority,
             {_LABEL_SQL} AS y,
             least(1 - {P_EPS},
                   greatest({P_EPS},
                            (o_totalprice - lo) / (hi - lo))) AS prob
      FROM orders CROSS JOIN mm)
    SELECT priority,
           CAST(count(*) AS BIGINT) AS n,
           round(-avg(y * ln(prob) + (1 - y) * ln(1 - prob)), 6)
             AS log_loss,
           round(avg((prob - y) * (prob - y)), 6) AS brier
    FROM p GROUP BY priority
    """,
)
def log_loss_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proper scoring rules (log loss + Brier) per priority for the
    min-max-normalized price read as a pseudo-probability of the
    finalized label — the "how good are the probabilities themselves"
    counterpart to `calibration_bins`' reliability view. One broadcast
    1-row min/max cross-join feeds a single conditional aggregation:
    one scan, no extra shuffle, the calibration-family shape. The
    probability is clamped to [{P_EPS}, 1-{P_EPS}] on BOTH engines so
    ln() stays finite at the min/max rows; expression op-order is
    identical cross-engine and round(6) absorbs partial-merge ULP
    noise in the averages."""
    o = load_table(spark, "orders", sf_dir)
    mm = o.agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
    prob = F.least(
        F.lit(1 - P_EPS),
        F.greatest(
            F.lit(P_EPS),
            (F.col("o_totalprice") - F.col("lo")) / (F.col("hi") - F.col("lo")),
        ),
    )
    p = o.crossJoin(F.broadcast(mm)).select(
        F.col("o_orderpriority").alias("priority"),
        _label().alias("y"),
        prob.alias("prob"),
    )
    return p.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            -F.avg(
                F.col("y") * F.log(F.col("prob"))
                + (1 - F.col("y")) * F.log(1 - F.col("prob"))
            ),
            6,
        ).alias("log_loss"),
        F.round(F.avg((F.col("prob") - F.col("y")) * (F.col("prob") - F.col("y"))), 6).alias(
            "brier"
        ),
    )


# ------------------------------------------------- naive_bayes train/score


NB_SMOOTH = 1  # add-one Laplace smoothing


def _nb_model_sql() -> str:
    """Shared CTE prefix building the multinomial NB model — the oracle
    twin of `_nb_model()`; keep the two in lockstep."""
    return f"""
    WITH wc AS (
      SELECT lang, w, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY 1, 2),
    vocab AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM wc),
    lt AS (SELECT lang, CAST(sum(n) AS BIGINT) AS nn FROM wc GROUP BY 1),
    grid AS (
      SELECT l.lang, w.w, l.nn, coalesce(wc.n, 0) AS n
      FROM (SELECT DISTINCT w FROM wc) w
      CROSS JOIN lt l
      LEFT JOIN wc ON wc.lang = l.lang AND wc.w = w.w),
    model AS (
      SELECT lang, w, n,
             round(ln((n + {NB_SMOOTH}) * 1.0
                      / (nn + {NB_SMOOTH} * (SELECT v FROM vocab))), 9)
               AS log_p
      FROM grid)"""


@query(
    "naive_bayes_train",
    _nb_model_sql() + """
    SELECT lang, w, n, log_p FROM model
    """,
)
def naive_bayes_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes training over the documents corpus:
    add-one-smoothed log P(word | lang) on the full lang×vocab grid —
    the classic scale-friendly text classifier whose "training" is
    nothing but counting, i.e. exactly one hash aggregation over the
    exploded token stream plus two tiny broadcast marginals (per-lang
    token totals, global vocab size). The model table is
    |vocab|×|langs| — bounded by language content, not corpus size —
    which is why NB remains the baseline classifier at 100 TB: training
    cost is one scan regardless of model quality.

    The grid includes zero-count (lang, word) cells: smoothing gives
    them mass, and the scorer depends on every (lang, word) pair
    existing. log_p is quantized at 1e-9 so the scorer's sums run over
    identical doubles cross-engine (the pagerank discipline)."""
    d = load_table(spark, "documents", sf_dir)
    # wc feeds FOUR consumers (vocab distinct, the vocab.count() driver
    # action, per-lang totals, and the grid's left join) — without
    # materialization each re-runs the corpus explode+count (optimization
    # r11, guide §1.2). The table is |langs|×|vocab|-bounded, tiny.
    wc = (
        d.select("lang", F.explode(F.split(F.col("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    vocab = wc.select("w").distinct()
    v = vocab.count()  # bounded driver scalar: vocab size (one int)
    lt = wc.groupBy("lang").agg(F.sum("n").alias("nn"))
    grid = (
        vocab.crossJoin(F.broadcast(lt))
        .join(wc, ["lang", "w"], "left")
        .select(
            "lang", "w", F.coalesce("n", F.lit(0)).alias("n"), "nn"
        )
    )
    return grid.select(
        "lang",
        "w",
        "n",
        F.round(
            F.log((F.col("n") + NB_SMOOTH) * 1.0 / (F.col("nn") + NB_SMOOTH * v)),
            9,
        ).alias("log_p"),
    )


@query(
    "naive_bayes_score",
    _nb_model_sql() + """,
    prior AS (
      SELECT lang, ln(count(*) * 1.0
                     / (SELECT count(*) FROM documents)) AS log_prior
      FROM documents GROUP BY lang),
    dw AS (
      SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents)
      WHERE w <> '' GROUP BY 1, 2),
    scores AS (
      SELECT dw.doc_id, m.lang,
             round(any_value(p.log_prior) + sum(dw.c * m.log_p), 6) AS score
      FROM dw
      JOIN model m ON m.w = dw.w
      JOIN prior p ON p.lang = m.lang
      GROUP BY dw.doc_id, m.lang)
    SELECT doc_id, lang AS pred_lang, score AS best_score
    FROM (SELECT doc_id, lang, score,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, lang) AS rn
          FROM scores)
    WHERE rn = 1
    """,
)
def naive_bayes_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive Bayes inference over the same corpus: every document is
    scored against every language (ln prior + Σ count·log_p) and the
    argmax wins. The model (|vocab|×|langs|, built by the train query's
    shared expression) is BROADCAST onto the per-doc word counts — the
    join fans each doc-word row out |langs| ways, collapses map-side to
    (doc, lang) partials, and never shuffles the corpus by vocab key.
    This is the canonical "apply a small model at scale" plan: one scan
    of the docs, one broadcast, one partial-agg shuffle of
    |docs|×|langs| score rows.

    Determinism: model log_p is 1e-9-quantized and scores round(6)
    BEFORE the argmax; ties on the rounded score break by lang asc on
    both engines (arg_min over the (-score, lang) tuple mirrors the
    window sort), so the prediction cannot flip on sum-order ULPs."""
    d = load_table(spark, "documents", sf_dir)
    model = naive_bayes_train(spark, sf_dir).select("lang", "w", "log_p")
    n_docs = d.count()  # bounded driver scalar (one int)
    prior = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("nd"))
        .select("lang", F.log(F.col("nd") * 1.0 / n_docs).alias("log_prior"))
    )
    dw = (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    scores = (
        dw.join(F.broadcast(model), "w")
        .join(F.broadcast(prior), "lang")
        .groupBy("doc_id", "lang")
        .agg(
            F.round(
                F.first("log_prior") + F.sum(F.col("c") * F.col("log_p")), 6
            ).alias("score")
        )
    )
    w_rank = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("lang"))
    return (
        scores.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("lang").alias("pred_lang"),
            F.round("score", 6).alias("best_score"),
        )
    )


# ----------------------------------------------------- isotonic_calibration


@query(
    "isotonic_calibration",
    f"""
    WITH mm AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
                FROM orders),
    bins AS (
      SELECT {_bin_sql('o_totalprice')} AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum({_LABEL_SQL}) AS BIGINT) AS pos
      FROM orders CROSS JOIN mm GROUP BY 1),
    pre AS (
      SELECT bin, n, pos,
             sum(n) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
             sum(pos) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cpos
      FROM bins),
    iv AS (
      SELECT i.bin AS i, j.bin AS j,
             (j.cpos - (i.cpos - i.pos)) * 1.0
               / (j.cn - (i.cn - i.n)) AS wavg
      FROM pre i JOIN pre j ON i.bin <= j.bin),
    mn AS (
      SELECT iv.i, b.bin, min(iv.wavg) AS m
      FROM iv JOIN pre b ON iv.i <= b.bin AND b.bin <= iv.j
      GROUP BY iv.i, b.bin),
    iso AS (SELECT bin, max(m) AS iso_raw FROM mn GROUP BY bin)
    SELECT b.bin, b.n, b.pos,
           round(b.pos * 1.0 / b.n, 6) AS raw_rate,
           round(iso.iso_raw, 6)       AS iso_rate
    FROM bins b JOIN iso USING (bin)
    """,
)
def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) recalibration of the reliability curve: the
    monotone-nondecreasing rates closest (weighted L2) to the observed
    per-bin positive rates — what turns `calibration_bins`' raw
    diagram into a usable score→probability mapping. Classic PAV is a
    sequential pool-adjacent-violators sweep (hostile to distribution);
    here the fit uses the exact minimax identity
    iso(b) = max_{{i≤b}} min_{{j≥b}} wavg(rate, i..j), which is pure
    relational algebra over the {N_BINS}-row bin LATTICE: interval
    averages from prefix sums, then two bounded min/max aggregations —
    at most {N_BINS}³ lattice tuples regardless of corpus size, after
    the same single-scan binning as calibration_bins.

    FP parity: interval averages are exact-integer ratios and min/max
    are order-free, so both engines produce identical doubles before
    round(6). Monotonicity of iso_rate is pinned in tests against a
    brute-force sequential PAV."""
    o = load_table(spark, "orders", sf_dir)
    mm = o.agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
    bins = (
        o.crossJoin(F.broadcast(mm))
        .groupBy(_bin_col(F.col("o_totalprice"), F.col("lo"), F.col("hi")).alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(_label()).alias("pos"))
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    pre = bins.withColumn("cn", F.sum("n").over(w)).withColumn(
        "cpos", F.sum("pos").over(w)
    )
    i, j = pre.alias("i"), pre.alias("j")
    iv = i.join(j, F.col("i.bin") <= F.col("j.bin")).select(
        F.col("i.bin").alias("i"),
        F.col("j.bin").alias("j"),
        (
            (F.col("j.cpos") - (F.col("i.cpos") - F.col("i.pos"))) * 1.0
            / (F.col("j.cn") - (F.col("i.cn") - F.col("i.n")))
        ).alias("wavg"),
    )
    b = pre.select(F.col("bin"))
    mn = (
        iv.join(b, (F.col("i") <= F.col("bin")) & (F.col("bin") <= F.col("j")))
        .groupBy("i", "bin")
        .agg(F.min("wavg").alias("m"))
    )
    iso = mn.groupBy("bin").agg(F.max("m").alias("iso_raw"))
    return (
        bins.join(iso, "bin")
        .select(
            "bin",
            "n",
            "pos",
            F.round(F.col("pos") * 1.0 / F.col("n"), 6).alias("raw_rate"),
            F.round("iso_raw", 6).alias("iso_rate"),
        )
    )


# --------------------------------------------- experimentation: CUPED, delta


# Exact-moment fragments for cuped_adjustment (r6 kernel purge,
# carrier hardened r7 per ADVICE): the event-level value quantizes to a
# 1e-4 grid, per-user pre/post totals are exact int64, and the five
# global moments are exact integer sums. Second moments reach ~1e18 per
# user-row — the r6 carriers (DECIMAL(38,0) Spark / HUGEINT DuckDB)
# held the SUM exactly but convert to double differently past 2^63
# (Spark BigInteger.doubleValue is correctly rounded; DuckDB recombines
# 64-bit halves — a double rounding), so "bit-identical by construction"
# had a residual env risk. r7: the hi/lo int64 carrier
# (functions/exactagg.py) — IDENTICAL text on both engines, only exact
# int64->double conversions, sums exact to 2^93 ~ 9.9e27 (covers the
# ~1e22–1e25 worst-case second-moment budget). Per-row budget:
# |x|, |y| < 3.03e9 (= sqrt(2^63), i.e. user-total |value| < 3.0e5)
# before the int64 product wraps — documented, loud in DuckDB.
_CU_VQ = "CAST(floor(value * 1e4 + 0.5) AS BIGINT)"
_CU_N = "CAST(count(x) AS DOUBLE)"
_CU_SX = "CAST(CAST(sum(x) AS BIGINT) AS DOUBLE)"
_CU_SY = "CAST(CAST(sum(y) AS BIGINT) AS DOUBLE)"
_CU_SXX = hilo_sum_sql("x * x")
_CU_SYY = hilo_sum_sql("y * y")
_CU_SXY = hilo_sum_sql("x * y")


def _cu_var(sqq: str, sv: str) -> str:
    return f"(({_CU_N} * {sqq} - {sv} * {sv}) / ({_CU_N} * {_CU_N}))"


def _cu_cov(sxy: str) -> str:
    return (
        f"(({_CU_N} * {sxy} - {_CU_SX} * {_CU_SY}) / ({_CU_N} * {_CU_N}))"
    )


_CU_VX = _cu_var(_CU_SXX, _CU_SX)
_CU_VY = _cu_var(_CU_SYY, _CU_SY)
_CU_CXY = _cu_cov(_CU_SXY)
# Degenerate-input guards (ADVICE r6: Spark's non-ANSI double divide
# NULLs on /0 where DuckDB yields inf/nan — share the sentinel instead):
_CU_THETA = "CASE WHEN vx > 0.0 THEN floor(cxy / vx * 1e6 + 0.5) / 1e6 END"
_CU_VRAW = "floor(vy / 1e8 * 1e4 + 0.5) / 1e4"
_CU_VADJ = (
    "CASE WHEN vx > 0.0 THEN"
    " floor((vy - cxy * cxy / vx) / 1e8 * 1e4 + 0.5) / 1e4 END"
)
_CU_VREDUX = (
    "CASE WHEN vx > 0.0 AND vy > 0.0 THEN"
    " floor((cxy * cxy / vx) / vy * 1e6 + 0.5) / 1e6 END"
)


@query(
    "cuped_adjustment",
    f"""
    WITH u AS (
      SELECT user_id,
             sum(CASE WHEN day(ts) <= 15 THEN {_CU_VQ} ELSE 0 END) AS x,
             sum(CASE WHEN day(ts) >  15 THEN {_CU_VQ} ELSE 0 END) AS y
      FROM events GROUP BY user_id),
    m AS (
      SELECT CAST(count(x) AS BIGINT) AS n_users,
             {_CU_CXY} AS cxy,
             {_CU_VX}  AS vx,
             {_CU_VY} AS vy
      FROM u)
    SELECT n_users,
           {_CU_THETA}  AS theta,
           {_CU_VRAW}   AS var_raw,
           {_CU_VADJ}   AS var_adjusted,
           {_CU_VREDUX} AS variance_reduction
    FROM m
    """,
)
def cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for experimentation: using each user's
    pre-period activity (days 1-15) as the control covariate for their
    post-period metric (days 16+), θ = cov(x,y)/var(x) and the adjusted
    metric y − θ(x − x̄) has variance var(y) − cov²/var(x) — the
    standard trick that shrinks A/B confidence intervals without
    touching assignment. Two shuffles total at any scale: one
    user-level conditional aggregation (map-side combinable), then the
    global moment aggregation of 5 scalars. The reported
    variance_reduction = ρ² is the fraction of metric variance the
    covariate explains.

    Cross-engine contract (r6 kernel purge; carrier hardened r7):
    value quantizes to the 1e-4 grid AT THE EVENT LEVEL (pure-IEEE
    floor form), so the per-user pre/post totals are exact int64
    outright and the global moments are exact integer sums — the
    second moments (x² per user reaches ~1e18) carried by the hi/lo
    int64 pair with IDENTICAL text on both engines (module comment
    above; the r6 DECIMAL/HUGEINT carriers converted to double
    differently past 2^63). θ and ρ² are grid-scale-invariant; the
    variances divide the 1e8 grid² factor back out. No var_pop/
    covar_pop kernels anywhere; every double derives from identical
    integers via shared expression text, with shared CASE guards on
    zero-variance inputs. Outputs floor-round at 6dp (ratios) / 4dp
    (value²-scale)."""
    e = load_table(spark, "events", sf_dir)
    u = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.dayofmonth("ts") <= 15, F.expr(_CU_VQ)).otherwise(F.lit(0))
        ).alias("x"),
        F.sum(
            F.when(F.dayofmonth("ts") > 15, F.expr(_CU_VQ)).otherwise(F.lit(0))
        ).alias("y"),
    )
    m = u.agg(
        F.count("x").alias("n_users"),
        F.expr(_CU_CXY).alias("cxy"),
        F.expr(_CU_VX).alias("vx"),
        F.expr(_CU_VY).alias("vy"),
    )
    return m.select(
        "n_users",
        F.expr(_CU_THETA).alias("theta"),
        F.expr(_CU_VRAW).alias("var_raw"),
        F.expr(_CU_VADJ).alias("var_adjusted"),
        F.expr(_CU_VREDUX).alias("variance_reduction"),
    )


# Exact-moment contract (r6 kernel purge, same rationale as ttest_welch;
# lands BEFORE this query's first driver row): the user-level (x, y) are
# already INTEGER counts, so the per-arm moments are exact int64 sums
# outright — no quantization needed, no var_pop/covar_pop kernels — and
# every double below derives from identical integers via identical text.
_DM_N = "CAST(count(x) AS DOUBLE)"
_DM_SX = "CAST(sum(x) AS DOUBLE)"
_DM_SY = "CAST(sum(y) AS DOUBLE)"
_DM_SXX = "CAST(sum(x * x) AS DOUBLE)"
_DM_SXY = "CAST(sum(x * y) AS DOUBLE)"
_DM_SYY = "CAST(sum(y * y) AS DOUBLE)"
_DM_MY = f"({_DM_SY} / {_DM_N})"
_DM_VX = f"(({_DM_N} * {_DM_SXX} - {_DM_SX} * {_DM_SX}) / ({_DM_N} * {_DM_N}))"
_DM_VY = f"(({_DM_N} * {_DM_SYY} - {_DM_SY} * {_DM_SY}) / ({_DM_N} * {_DM_N}))"
_DM_CXY = f"(({_DM_N} * {_DM_SXY} - {_DM_SX} * {_DM_SY}) / ({_DM_N} * {_DM_N}))"
# Degenerate guards (ADVICE r6): sy = 0 makes the ratio undefined —
# Spark's non-ANSI divide NULLs while DuckDB yields inf, so the guard is
# the shared sentinel; the se radicand can land a few ulps negative on
# near-degenerate arms, where Spark sqrt gives NaN but DuckDB RAISES —
# the <= 0 clamp keeps both engines on 0.0.
_DM_RATIO = "CASE WHEN sy > 0 THEN sx * 1.0 / sy END"
_DM_SE_INNER = (
    "((vx - 2 * (sx * 1.0 / sy) * cxy"
    " + (sx * 1.0 / sy) * (sx * 1.0 / sy) * vy)"
    " / (n_users * my * my))"
)
_DM_SE = (
    f"CASE WHEN sy = 0 OR my <= 0.0 THEN NULL"
    f" WHEN {_DM_SE_INNER} <= 0.0 THEN 0.0"
    f" ELSE sqrt{_DM_SE_INNER} END"
)


@query(
    "delta_method_ratio_ci",
    f"""
    WITH u AS (
      SELECT user_id, user_id % 2 AS arm,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT arm,
             CAST(count(x) AS BIGINT) AS n_users,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             {_DM_MY} AS my,
             {_DM_VX} AS vx,
             {_DM_VY} AS vy,
             {_DM_CXY} AS cxy
      FROM u GROUP BY arm),
    r AS (
      SELECT arm, n_users, sx, sy,
             {_DM_RATIO} AS ratio,
             {_DM_SE} AS se
      FROM m)
    SELECT arm, n_users, sx AS clicks, sy AS views,
           floor(ratio * 1e6 + 0.5) / 1e6              AS ratio,
           floor(se * 1e6 + 0.5) / 1e6                 AS se,
           floor((ratio - 1.96 * se) * 1e6 + 0.5) / 1e6 AS ci_lo,
           floor((ratio + 1.96 * se) * 1e6 + 0.5) / 1e6 AS ci_hi
    FROM r
    """,
)
def delta_method_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method CI for a ratio-of-sums metric (clicks per view) per
    experiment arm — the correct standard error when the unit of
    randomization (user) differs from the unit of analysis (view), the
    mistake naive per-view binomial CIs make. Per arm:
    se² = (var(x) − 2R·cov(x,y) + R²·var(y)) / (n·ȳ²) with user-level
    (x, y) pairs. Shape: one user-level conditional count aggregation,
    then a per-arm moment aggregation — two map-side-combinable
    shuffles at any scale, no per-user state afterward.

    Cross-engine contract (r6): the user-level counts are integers, so
    the five moments are EXACT int64 sums (no var_pop/covar_pop
    kernels); (co)variances, the ratio and the delta-method se derive
    from those integers through shared double expressions (module
    constants, same text in the oracle) — bit-identical across engines
    by construction. Outputs floor-round at 6dp."""
    e = load_table(spark, "events", sf_dir)
    u = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("y"),
    ).withColumn("arm", F.col("user_id") % 2)
    m = u.groupBy("arm").agg(
        F.count("x").alias("n_users"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.expr(_DM_MY).alias("my"),
        F.expr(_DM_VX).alias("vx"),
        F.expr(_DM_VY).alias("vy"),
        F.expr(_DM_CXY).alias("cxy"),
    )
    r = m.select(
        "arm",
        "n_users",
        "sx",
        "sy",
        "my",
        "vx",
        "vy",
        "cxy",
        F.expr(_DM_RATIO).alias("ratio"),
    ).withColumn("se", F.expr(_DM_SE))
    return r.select(
        "arm",
        "n_users",
        F.col("sx").alias("clicks"),
        F.col("sy").alias("views"),
        F.expr("floor(ratio * 1e6 + 0.5) / 1e6").alias("ratio"),
        F.expr("floor(se * 1e6 + 0.5) / 1e6").alias("se"),
        F.expr("floor((ratio - 1.96 * se) * 1e6 + 0.5) / 1e6").alias("ci_lo"),
        F.expr("floor((ratio + 1.96 * se) * 1e6 + 0.5) / 1e6").alias("ci_hi"),
    )


# -------------------------------------------------------- feature_info_gain


@query(
    "feature_info_gain",
    f"""
    WITH mm AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
                FROM orders),
    fv AS (
      SELECT 'price_bin' AS feature,
             CAST({_bin_sql('o_totalprice')} AS VARCHAR) AS val,
             {_LABEL_SQL} AS y
      FROM orders CROSS JOIN mm
      UNION ALL
      SELECT 'priority', o_orderpriority, {_LABEL_SQL} FROM orders
      UNION ALL
      SELECT 'month', CAST(month(o_orderdate) AS VARCHAR), {_LABEL_SQL}
      FROM orders
      UNION ALL
      SELECT 'cust_mod10', CAST(o_custkey % 10 AS VARCHAR), {_LABEL_SQL}
      FROM orders),
    cells AS (
      SELECT feature, val,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT)   AS pos
      FROM fv GROUP BY 1, 2),
    tot AS (
      SELECT feature, CAST(sum(n) AS BIGINT) AS nn,
             CAST(sum(pos) AS BIGINT) AS tpos
      FROM cells GROUP BY feature),
    ent AS (
      SELECT c.feature,
             t.nn, t.tpos,
             sum((c.n * 1.0 / t.nn)
                 * (CASE WHEN c.pos = 0 OR c.pos = c.n THEN 0.0
                    ELSE -(c.pos * 1.0 / c.n) * ln(c.pos * 1.0 / c.n)
                         - (1 - c.pos * 1.0 / c.n)
                           * ln(1 - c.pos * 1.0 / c.n) END)) AS h_cond,
             CAST(count(*) AS BIGINT) AS n_values
      FROM cells c JOIN tot t USING (feature)
      GROUP BY c.feature, t.nn, t.tpos)
    SELECT feature, n_values,
           round((CASE WHEN tpos = 0 OR tpos = nn THEN 0.0
                  ELSE -(tpos * 1.0 / nn) * ln(tpos * 1.0 / nn)
                       - (1 - tpos * 1.0 / nn) * ln(1 - tpos * 1.0 / nn) END)
                 - h_cond, 6) AS info_gain
    FROM ent
    """,
)
def feature_info_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information-gain feature ranking: how many bits (nats) each
    candidate feature — price bin, priority, order month, and a
    deliberate noise feature (custkey mod 10) — carries about the
    finalized label. IG(f) = H(y) − Σ_v p(v)·H(y|v). The k features are
    evaluated in ONE scan: an Expand (explode of (feature, value)
    structs — Spark's grouping-sets machinery, k rows out per input
    row, all map-side) feeds one hash aggregation to the per-feature
    value lattices; entropies are arithmetic over those ≤Σ|domain|
    cells. This is the feature-selection pass a training pipeline runs
    before committing to an encoder — the multi-feature generalization
    of `mutual_information` (binary label instead of binned metric).

    The noise feature pins the statistic's sanity: its IG must land
    near 0 (asserted in tests). Probabilities are exact-integer ratios;
    per-feature entropy sums run over bounded cells with round(6)."""
    o = load_table(spark, "orders", sf_dir)
    mm = o.agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
    y = _label().alias("y")
    fv = (
        o.crossJoin(F.broadcast(mm))
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("price_bin").alias("feature"),
                        _bin_col(F.col("o_totalprice"), F.col("lo"), F.col("hi"))
                        .cast("string")
                        .alias("val"),
                    ),
                    F.struct(
                        F.lit("priority").alias("feature"),
                        F.col("o_orderpriority").alias("val"),
                    ),
                    F.struct(
                        F.lit("month").alias("feature"),
                        F.month("o_orderdate").cast("string").alias("val"),
                    ),
                    F.struct(
                        F.lit("cust_mod10").alias("feature"),
                        (F.col("o_custkey") % 10).cast("string").alias("val"),
                    ),
                )
            ).alias("f"),
            y,
        )
        .select(F.col("f.feature").alias("feature"), F.col("f.val").alias("val"), "y")
    )
    cells = fv.groupBy("feature", "val").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    tot = cells.groupBy("feature").agg(
        F.sum("n").alias("nn"), F.sum("pos").alias("tpos")
    )

    def _h(p: F.Column) -> F.Column:
        return -(p * F.log(p)) - (1 - p) * F.log(1 - p)

    p_cell = F.col("pos") * 1.0 / F.col("n")
    h_cell = F.when(
        (F.col("pos") == 0) | (F.col("pos") == F.col("n")), F.lit(0.0)
    ).otherwise(_h(p_cell))
    ent = (
        cells.join(F.broadcast(tot), "feature")
        .groupBy("feature", "nn", "tpos")
        .agg(
            F.sum((F.col("n") * 1.0 / F.col("nn")) * h_cell).alias("h_cond"),
            F.count(F.lit(1)).alias("n_values"),
        )
    )
    p_glob = F.col("tpos") * 1.0 / F.col("nn")
    h_glob = F.when(
        (F.col("tpos") == 0) | (F.col("tpos") == F.col("nn")), F.lit(0.0)
    ).otherwise(_h(p_glob))
    return ent.select(
        "feature",
        "n_values",
        F.round(h_glob - F.col("h_cond"), 6).alias("info_gain"),
    )


# ------------------------------------------------------- qini_uplift_curve


QINI_QS = tuple(round(0.1 * i, 1) for i in range(1, 10))  # decile cuts


@query(
    "qini_uplift_curve",
    f"""
    WITH u AS (
      SELECT user_id, user_id % 2 AS arm,
             round(sum(CASE WHEN day(ts) <= 15 THEN value ELSE 0 END), 4)
               AS score,
             max(CASE WHEN day(ts) > 15 AND event_type = 'purchase'
                 THEN 1 ELSE 0 END) AS y
      FROM events GROUP BY user_id),
    b AS (
      SELECT {', '.join(f"round(quantile_cont(score, {q}), 4) AS q{i}" for i, q in enumerate(QINI_QS))}
      FROM u),
    dec AS (
      SELECT u.*,
             ({' + '.join(f"(u.score > b.q{i})::INT" for i in range(len(QINI_QS)))})
               AS decile
      FROM u CROSS JOIN b),
    g AS (
      SELECT decile,
             CAST(sum(arm) AS BIGINT)                    AS nt,
             CAST(sum(1 - arm) AS BIGINT)                AS nc,
             CAST(sum(arm * y) AS BIGINT)                AS yt,
             CAST(sum((1 - arm) * y) AS BIGINT)          AS yc
      FROM dec GROUP BY decile),
    c AS (
      SELECT decile, nt, nc, yt, yc,
             sum(nt) OVER w AS cnt, sum(nc) OVER w AS cnc,
             sum(yt) OVER w AS cyt, sum(yc) OVER w AS cyc
      FROM g
      WINDOW w AS (ORDER BY decile DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT decile, nt, nc, yt, yc,
           CASE WHEN cnt = 0 OR cnc = 0 THEN NULL
                ELSE round(cyt * 1.0 / cnt - cyc * 1.0 / cnc, 6) END
             AS uplift_cum,
           CASE WHEN cnc = 0 THEN NULL
                ELSE round(cyt - cyc * 1.0 * cnt / cnc, 4) END AS qini_cum
    FROM c
    """,
)
def qini_uplift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini / uplift curve: rank users by their pre-period activity
    score (the CUPED covariate) and read, decile by decile from the
    top, the INCREMENTAL conversions the treatment arm shows over
    control — the evaluation for "whom should we target" models, where
    `roc_auc` answers "who converts" and this answers "who converts
    BECAUSE OF the treatment". uplift_cum is the cumulative rate gap,
    qini_cum the absolute incremental conversions (the Qini curve's
    y-axis).

    Shape: one user rollup (conditional sums), a 9-scalar exact-
    percentile row broadcast back for RFM-style decile-by-comparison
    (no global ntile sort), one 10-row hash agg, windows over the
    decile lattice. Deterministic: cuts rounded before comparison,
    arms/outcomes integers, ratios of exact int64 cumulations; a
    decile prefix with no control (or no treatment) users yet reports
    NULL instead of dividing by zero (hit at sf0.001)."""
    e = load_table(spark, "events", sf_dir)
    u = e.groupBy("user_id").agg(
        F.round(
            F.sum(F.when(F.dayofmonth("ts") <= 15, F.col("value")).otherwise(0.0)), 4
        ).alias("score"),
        F.max(
            F.when(
                (F.dayofmonth("ts") > 15) & (F.col("event_type") == "purchase"), 1
            ).otherwise(0)
        ).alias("y"),
    ).withColumn("arm", (F.col("user_id") % 2).cast("int"))
    b = u.agg(
        *[
            F.round(F.expr(f"percentile(score, {q})"), 4).alias(f"q{i}")
            for i, q in enumerate(QINI_QS)
        ]
    )
    dec_expr = sum(
        (F.when(F.col("score") > F.col(f"q{i}"), 1).otherwise(0) for i in range(len(QINI_QS))),
        F.lit(0),
    )
    dec = u.crossJoin(F.broadcast(b)).withColumn("decile", dec_expr)
    g = dec.groupBy("decile").agg(
        F.sum("arm").alias("nt"),
        F.sum(1 - F.col("arm")).alias("nc"),
        F.sum(F.col("arm") * F.col("y")).alias("yt"),
        F.sum((1 - F.col("arm")) * F.col("y")).alias("yc"),
    )
    w = Window.orderBy(F.desc("decile")).rowsBetween(Window.unboundedPreceding, 0)
    c = (
        g.withColumn("cnt", F.sum("nt").over(w))
        .withColumn("cnc", F.sum("nc").over(w))
        .withColumn("cyt", F.sum("yt").over(w))
        .withColumn("cyc", F.sum("yc").over(w))
    )
    return c.select(
        "decile",
        "nt",
        "nc",
        "yt",
        "yc",
        F.when(
            (F.col("cnt") == 0) | (F.col("cnc") == 0), F.lit(None).cast("double")
        )
        .otherwise(
            F.round(
                F.col("cyt") * 1.0 / F.col("cnt")
                - F.col("cyc") * 1.0 / F.col("cnc"),
                6,
            )
        )
        .alias("uplift_cum"),
        F.when(F.col("cnc") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.col("cyt") - F.col("cyc") * 1.0 * F.col("cnt") / F.col("cnc"), 4
            )
        )
        .alias("qini_cum"),
    )


# ------------------------------------------------------- kruskal_wallis


@query(
    "kruskal_wallis",
    """
    WITH lv AS (
      SELECT c_nationkey, c_mktsegment, c_acctbal AS v,
             CAST(count(*) AS BIGINT) AS c
      FROM customer GROUP BY 1, 2, 3),
    tv AS (
      SELECT c_nationkey, v, CAST(sum(c) AS BIGINT) AS t
      FROM lv GROUP BY 1, 2),
    rk AS (
      SELECT c_nationkey, v, t,
             CAST(2 * (sum(t) OVER (PARTITION BY c_nationkey ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t)
                  + t + 1 AS BIGINT) AS two_r
      FROM tv),
    grp AS (
      SELECT lv.c_nationkey, c_mktsegment,
             CAST(sum(lv.c) AS BIGINT)               AS n_g,
             CAST(sum(lv.c * rk.two_r) AS BIGINT)    AS r2_g
      FROM lv JOIN rk ON lv.c_nationkey = rk.c_nationkey AND lv.v = rk.v
      GROUP BY 1, 2),
    ties AS (
      SELECT c_nationkey, CAST(sum(t * t * t - t) AS BIGINT) AS tie_sum
      FROM tv GROUP BY 1),
    nat AS (
      SELECT g.c_nationkey,
             CAST(count(*) AS BIGINT)   AS k,
             CAST(sum(n_g) AS BIGINT)   AS n,
             sum((CAST(r2_g AS DOUBLE) * r2_g) / (4.0 * n_g)) AS s
      FROM grp g GROUP BY 1),
    h AS (
      SELECT nat.c_nationkey AS nationkey, n AS n_rows, k AS n_groups,
             (12.0 / (n * (n + 1.0)) * s - 3.0 * (n + 1))
               / (1.0 - CAST(tie_sum AS DOUBLE)
                        / (CAST(n AS DOUBLE) * n * n - n)) AS hc
      FROM nat JOIN ties ON nat.c_nationkey = ties.c_nationkey
      WHERE k >= 2 AND n > k
        AND tie_sum < CAST(n AS DOUBLE) * n * n - n)
    SELECT nationkey, n_rows, n_groups,
           round(hc, 4) AS h_stat,
           round((hc - n_groups + 1) / (n_rows - n_groups), 6) AS epsilon_sq
    FROM h
    """,
)
def kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H per nation: does the account-balance DISTRIBUTION
    differ across market segments? The rank-based (distribution-free)
    companion to `anova_oneway` (means) and the k-sample generalization
    of the Mann-Whitney machinery `roc_auc` uses — with the midrank tie
    correction 1 - sum(t^3 - t)/(N^3 - N).

    Shape: ranks are NEVER assigned to rows. The table collapses to the
    (nation, value) lattice in one hash aggregation; the midrank window
    runs per nation over the lattice (parallel across nations, lattice-
    bounded rows per task); group rank sums come from the integer
    identity 2*midrank = 2*cum_before + t + 1, so both engines sum EXACT
    int64s and floats appear only in the final H algebra. r2_g is cast
    to double BEFORE squaring on both engines (int64 r2^2 overflows at
    ~10^5 rows/nation; the double path is engine-identical). Degenerate
    nations (one segment; n <= k; all balances tied, where the tie
    correction's N^3 - N equals tie_sum making hc 0/0) are excluded by
    the k >= 2 AND n > k AND tie_sum < N^3 - N gate — none occur on
    this data, and the all-tied exclusion is pinned in tests.

    Reference provenance: generalizes the aggregate surface of
    cassandra_sink.scala:113-120 to distribution-level significance
    testing."""
    c = load_table(spark, "customer", sf_dir)
    lv = c.groupBy("c_nationkey", "c_mktsegment", F.col("c_acctbal").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tv = lv.groupBy("c_nationkey", "v").agg(F.sum("c").alias("t"))
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rk = tv.select(
        "c_nationkey",
        "v",
        (2 * (F.sum("t").over(w) - F.col("t")) + F.col("t") + 1)
        .cast("bigint")
        .alias("two_r"),
    )
    grp = (
        lv.join(rk, ["c_nationkey", "v"])
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.sum("c").alias("n_g"),
            F.sum(F.col("c") * F.col("two_r")).alias("r2_g"),
        )
    )
    ties = tv.groupBy("c_nationkey").agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie_sum")
    )
    nat = grp.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum((F.col("r2_g").cast("double") * F.col("r2_g")) / (4.0 * F.col("n_g"))).alias("s"),
    )
    n, k = F.col("n"), F.col("k")
    hc = (12.0 / (n * (n + 1.0)) * F.col("s") - 3.0 * (n + 1)) / (
        1.0
        - F.col("tie_sum").cast("double") / (n.cast("double") * n * n - n)
    )
    return (
        nat.join(ties, "c_nationkey")
        .filter(
            (k >= 2)
            & (n > k)
            & (F.col("tie_sum") < n.cast("double") * n * n - n)
        )
        .select(
            F.col("c_nationkey").alias("nationkey"),
            n.alias("n_rows"),
            k.alias("n_groups"),
            F.round(hc, 4).alias("h_stat"),
            F.round((hc - k + 1) / (n - k), 6).alias("epsilon_sq"),
        )
    )


# ----------------------------------------------- levene_brown_forsythe


@query(
    "levene_brown_forsythe",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS m
      FROM events GROUP BY 1),
    z AS (
      SELECT e.event_type, abs(e.value - med.m) AS z
      FROM events e JOIN med ON e.event_type = med.event_type),
    g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             sum(z) AS s, sum(z * z) AS s2
      FROM z GROUP BY 1),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
             sum(s) AS ts, sum(s2) AS ts2,
             sum(s * s / n) AS sgm
      FROM g)
    SELECT k AS n_groups, nn AS n_rows,
           CAST(k - 1 AS BIGINT)  AS df1,
           CAST(nn - k AS BIGINT) AS df2,
           round(((sgm - ts * ts / nn) / (k - 1))
                 / ((ts2 - sgm) / (nn - k)), 4) AS w_stat
    FROM t
    """,
)
def levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test (Levene with median centers): is event-value
    VARIANCE homogeneous across event types? The spread-equality
    companion to `anova_oneway` (which assumes it) — W is exactly the
    one-way ANOVA F computed on z = |x - median(group)|, median-centered
    for robustness to the heavy-tailed values this table has.

    Shape: two aggregation passes over one scan — per-group exact
    medians (Spark `percentile`, a per-group sort of bounded width;
    at 100 TB swap for percentile_approx and document the tolerance),
    broadcast back (k rows), then the same moment-partial (n, sum z,
    sum z^2) reduction anova_oneway uses: map-side combinable, k tiny
    states shuffled. Both engines interpolate the same exact median
    from identical doubles, so z agrees per-row and only the ~1e-12
    partial-sum-order noise reaches round(4).

    Reference provenance: generalizes the aggregate surface of
    cassandra_sink.scala:113-120 to variance diagnostics."""
    e = load_table(spark, "events", sf_dir)
    med = e.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("m"))
    z = e.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("m")).alias("z")
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("z").alias("s"),
        F.sum(F.col("z") * F.col("z")).alias("s2"),
    )
    t = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("ts"),
        F.sum("s2").alias("ts2"),
        F.sum(F.col("s") * F.col("s") / F.col("n")).alias("sgm"),
    )
    ssb = F.col("sgm") - F.col("ts") * F.col("ts") / F.col("nn")
    ssw = F.col("ts2") - F.col("sgm")
    return t.select(
        F.col("k").alias("n_groups"),
        F.col("nn").alias("n_rows"),
        (F.col("k") - 1).cast("bigint").alias("df1"),
        (F.col("nn") - F.col("k")).cast("bigint").alias("df2"),
        F.round(
            (ssb / (F.col("k") - 1)) / (ssw / (F.col("nn") - F.col("k"))), 4
        ).alias("w_stat"),
    )


# ---------------------------------------------------- brier_decomposition


@query(
    "brier_decomposition",
    f"""
    WITH mm AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
                FROM orders),
    b AS (
      SELECT {_bin_sql('o_totalprice')} AS bin,
             (o_totalprice - lo) / (hi - lo) AS p,
             CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y
      FROM orders CROSS JOIN mm),
    g AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n,
             sum(p) AS sp, sum(p * p) AS sp2, sum(y) AS sy, sum(p * y) AS spy
      FROM b GROUP BY 1),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS nn, sum(sy) AS tsy FROM g)
    SELECT nn AS n_rows,
           round(sum(sp2 - 2 * spy + sy) / nn, 6)                  AS brier,
           round(sum(n * (sp / n - sy / n) * (sp / n - sy / n)) / nn, 6)
                                                                   AS reliability,
           round(sum(n * (sy / n - tsy / nn) * (sy / n - tsy / nn)) / nn, 6)
                                                                   AS resolution,
           round((any_value(tsy) / nn) * (1 - any_value(tsy) / nn), 6)
                                                                   AS uncertainty,
           round(sum(sp2 - sp * sp / n) / nn, 6)                   AS wb_var,
           round(sum(spy - sp * sy / n) / nn, 6)                   AS wb_cov
    FROM g CROSS JOIN t
    GROUP BY nn
    """,
)
def brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score over the shared
    {N_BINS}-bin score binning: brier = reliability - resolution +
    uncertainty + within-bin variance - 2 * within-bin covariance —
    the diagnosis `calibration_bins` draws and `log_loss_brier` totals:
    HOW MUCH of the score is miscalibration (reliability, fixable by
    recalibration) vs lack of discrimination (resolution) vs intrinsic
    base-rate noise (uncertainty). The two within-bin terms make the
    identity EXACT for binned forecasts (they vanish only when the
    forecast is constant within each bin); the identity is pinned in
    tests.

    Shape: every term is algebra over per-bin (n, sum p, sum p^2,
    sum y, sum p*y) partials — ONE conditional hash aggregation of
    {N_BINS} groups over one scan (min/max scalars broadcast, same rig
    as calibration_bins), then a 1-row reduction. No window, no second
    scan, map-side combinable: the ideal 100 TB shape.

    Reference provenance: generalizes the aggregate surface of
    cassandra_sink.scala:113-120 to forecast-quality diagnostics."""
    o = load_table(spark, "orders", sf_dir)
    mm = o.agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
    lo, hi = F.col("lo"), F.col("hi")
    x = F.col("o_totalprice")
    b = o.crossJoin(F.broadcast(mm)).select(
        _bin_col(x, lo, hi).alias("bin"),
        ((x - lo) / (hi - lo)).alias("p"),
        F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0).alias("y"),
    )
    g = b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p").alias("sp"),
        F.sum(F.col("p") * F.col("p")).alias("sp2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("p") * F.col("y")).alias("spy"),
    )
    t = g.agg(F.sum("n").alias("nn"), F.sum("sy").alias("tsy"))
    n, sp, sp2, sy, spy = (F.col(c) for c in ("n", "sp", "sp2", "sy", "spy"))
    nn, tsy = F.col("nn"), F.col("tsy")
    return (
        g.crossJoin(F.broadcast(t))
        .groupBy("nn")
        .agg(
            F.round(F.sum(sp2 - 2 * spy + sy) / F.first("nn"), 6).alias("brier"),
            F.round(
                F.sum(n * (sp / n - sy / n) * (sp / n - sy / n)) / F.first("nn"), 6
            ).alias("reliability"),
            F.round(
                F.sum(n * (sy / n - tsy / nn) * (sy / n - tsy / nn)) / F.first("nn"),
                6,
            ).alias("resolution"),
            F.round(
                (F.first("tsy") / F.first("nn"))
                * (1 - F.first("tsy") / F.first("nn")),
                6,
            ).alias("uncertainty"),
            F.round(F.sum(sp2 - sp * sp / n) / F.first("nn"), 6).alias("wb_var"),
            F.round(F.sum(spy - sp * sy / n) / F.first("nn"), 6).alias("wb_cov"),
        )
        .select(
            F.col("nn").alias("n_rows"),
            "brier",
            "reliability",
            "resolution",
            "uncertainty",
            "wb_var",
            "wb_cov",
        )
    )
