"""Geospatial operators — grid-cell hotspot rollup and a grid-blocked
radius join (haversine), the spatial analogue of the blocked/banded
near-dup joins elsewhere in this package.

The testdata has no coordinate columns, so both engines DERIVE
deterministic pseudo-coordinates from integer keys with exact bigint
arithmetic (multiply → mod → divide): the doubles are bit-identical on
both sides, which keeps the haversine inputs identical too. The trig
itself (sin/cos/asin) differs by ≤1 ulp between java.lang.Math and
libm, absorbed by the round(…, 6) grid — the same cross-engine FP
contract dedup_embedding_cosine uses.

Scale shape (the point of this module): a radius join is O(n·m) if done
naively; blocking by 1°×1° grid cells turns it into an equi-join on
(cell_lat, cell_lon) — each probe point expands to its 3×3 neighbor
cells (a 9× map-side fan-out, constant), the join shuffles on cell keys,
and the exact haversine predicate runs only inside candidate cells. At
100 TB this is the standard spatial-join plan (grid/zone blocking +
exact refine); skewed cells (cities) would be salted like any hot key.

Reference parity: the reference (cassandra_sink.scala) has no spatial
operators — this module is part of the training-data-pipeline surface
the brief adds beyond the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources import load_table

# pi/180 and pi/360 as double LITERALS (not radians()/an engine builtin):
# java.lang.Math.toRadians computes deg/180*pi, DuckDB radians() computes
# deg*(pi/180) — different op order, different ulps. A shared literal
# multiplier makes the products bit-identical across engines.
DEG2RAD = "0.017453292519943295"
DEG2RAD_HALF = "0.008726646259971648"
EARTH_DIAMETER_KM = "12742.0"  # 2 * 6371 (mean Earth radius)

RADIUS_KM = 50.0
# lat is capped to [-60, 60): 1 degree of longitude is >= 55.6 km there,
# so a 50 km radius never reaches past the 3x3 neighbor cells.
_LAT_SPAN = ("-60.0", "120.0")
_LON_SPAN = ("-180.0", "360.0")
_LAT_MULT = 2654435761  # Knuth multiplicative-hash constant
_LON_MULT = 40503
_MOD = 1000000


def _coord_sql(key: str, mult: int, off: int, lo: str, span: str) -> str:
    """The derivation, spelled once: (key*mult+off) % MOD / MOD scaled
    into [lo, lo+span). Exact bigint ops then one division — the Spark
    twin `_coord_col` uses the identical expression tree."""
    return (
        f"{lo} + ((({key} * {mult} + {off}) % {_MOD}) / {_MOD}.0) * {span}"
    )


def _coord_col(key: Column, mult: int, off: int, lo: str, span: str) -> Column:
    u = (key.cast("bigint") * F.lit(mult) + F.lit(off)) % F.lit(_MOD)
    return F.lit(float(lo)) + (u / F.lit(float(_MOD))) * F.lit(float(span))


def with_coords(df: DataFrame, key: str) -> DataFrame:
    """Attach derived (lat, lon) + integer grid cell (1°×1°) to any
    keyed table. Pure map — no shuffle, stays in whole-stage codegen."""
    lat = _coord_col(F.col(key), _LAT_MULT, 0, *_LAT_SPAN)
    lon = _coord_col(F.col(key), _LON_MULT, 7, *_LON_SPAN)
    return (
        df.withColumn("lat", lat)
        .withColumn("lon", lon)
        .withColumn("cell_lat", F.floor("lat").cast("int"))
        .withColumn("cell_lon", F.floor("lon").cast("int"))
    )


def _coords_view_sql(table: str, key: str) -> str:
    lat = _coord_sql(key, _LAT_MULT, 0, *_LAT_SPAN)
    lon = _coord_sql(key, _LON_MULT, 7, *_LON_SPAN)
    return (
        f"SELECT *, {lat} AS lat, {lon} AS lon, "
        f"CAST(floor({lat}) AS INT) AS cell_lat, "
        f"CAST(floor({lon}) AS INT) AS cell_lon FROM {table}"
    )


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance, rounded to the 1e-6 km cross-engine grid.
    Identical formula text to `_HAVERSINE_SQL` (shared literals, same op
    order) so only the final trig ulps differ between engines."""
    dlat_h = (lat2 - lat1) * F.lit(float(DEG2RAD_HALF))
    dlon_h = (lon2 - lon1) * F.lit(float(DEG2RAD_HALF))
    s = (
        F.sin(dlat_h) * F.sin(dlat_h)
        + F.cos(lat1 * F.lit(float(DEG2RAD)))
        * F.cos(lat2 * F.lit(float(DEG2RAD)))
        * F.sin(dlon_h)
        * F.sin(dlon_h)
    )
    return F.round(F.lit(float(EARTH_DIAMETER_KM)) * F.asin(F.sqrt(s)), 6)


def _haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    dlat_h = f"(({lat2}) - ({lat1})) * {DEG2RAD_HALF}"
    dlon_h = f"(({lon2}) - ({lon1})) * {DEG2RAD_HALF}"
    return (
        f"round({EARTH_DIAMETER_KM} * asin(sqrt("
        f"sin({dlat_h}) * sin({dlat_h}) "
        f"+ cos(({lat1}) * {DEG2RAD}) * cos(({lat2}) * {DEG2RAD}) "
        f"* sin({dlon_h}) * sin({dlon_h}))), 6)"
    )


# ---------------------------------------------------------------------------
# Grid hotspot rollup
# ---------------------------------------------------------------------------
@query(
    "geo_grid_hotspots",
    f"""
    WITH pts AS ({_coords_view_sql("customer", "c_custkey")})
    SELECT cell_lat, cell_lon,
           count(*)                 AS n_customers,
           round(avg(c_acctbal), 4) AS avg_balance
    FROM pts
    GROUP BY cell_lat, cell_lon
    HAVING count(*) >= 2
    """,
)
def geo_grid_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density rollup on the 1°×1° grid: derive-cell (pure map) →
    hash-agg with map-side partials. The grid cell is the spatial
    GROUP BY key — the same plan as any high-cardinality groupBy, so it
    scales like one (no spatial index needed for a rollup)."""
    pts = with_coords(load_table(spark, "customer", sf_dir), "c_custkey")
    return (
        pts.groupBy("cell_lat", "cell_lon")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_balance"),
        )
        .filter(F.col("n_customers") >= 2)
    )


# ---------------------------------------------------------------------------
# Grid-blocked radius join (supplier → customers within RADIUS_KM)
# ---------------------------------------------------------------------------
@query(
    "geo_radius_join",
    f"""
    WITH s AS ({_coords_view_sql("supplier", "s_suppkey")}),
         c AS ({_coords_view_sql("customer", "c_custkey")}),
         pairs AS (
           SELECT s.s_suppkey,
                  {_haversine_sql("s.lat", "s.lon", "c.lat", "c.lon")} AS d_km
           FROM s JOIN c ON TRUE)
    SELECT s_suppkey,
           count(*)       AS n_within,
           min(d_km)      AS nearest_km
    FROM pairs
    WHERE d_km <= {RADIUS_KM}
    GROUP BY s_suppkey
    """,
)
def geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius join, grid-blocked: each supplier probes its 3×3 neighbor
    cells (9× constant fan-out, map-side), the join is an EQUI-join on
    (cell_lat, cell_lon) — shuffle-partitionable, never a cartesian —
    and the exact haversine refine runs only on co-cell candidates.
    Longitude cells wrap at ±180 (pmod) so antimeridian neighbors are
    probed; latitude is capped at ±60° by derivation so 1 lon-degree
    ≥ 55.6 km > RADIUS_KM and the 3×3 neighborhood is provably
    sufficient (completeness pinned against brute force in
    tests/test_geo.py). The oracle brute-forces the cross join — viable
    at oracle SF only, which is exactly why the blocked plan exists."""
    sup = with_coords(
        load_table(spark, "supplier", sf_dir).select("s_suppkey"), "s_suppkey"
    )
    cust = with_coords(
        load_table(spark, "customer", sf_dir).select("c_custkey"), "c_custkey"
    )
    return (
        radius_pairs_blocked(sup, "s_suppkey", cust, "c_custkey", RADIUS_KM)
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_within"),
            F.min("d_km").alias("nearest_km"),
        )
    )


KNN_K = 3


@query(
    "geo_knn_within_radius",
    f"""
    WITH s AS ({_coords_view_sql("supplier", "s_suppkey")}),
         c AS ({_coords_view_sql("customer", "c_custkey")}),
         pairs AS (
           SELECT c.c_custkey, s.s_suppkey,
                  {_haversine_sql("c.lat", "c.lon", "s.lat", "s.lon")} AS d_km
           FROM c JOIN s ON TRUE)
    SELECT c_custkey, s_suppkey, d_km,
           CAST(row_number() OVER (PARTITION BY c_custkey
                                   ORDER BY d_km, s_suppkey) AS INT) AS knn_rank
    FROM pairs
    WHERE d_km <= {RADIUS_KM}
    QUALIFY knn_rank <= {KNN_K}
    """,
)
def geo_knn_within_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded spatial kNN: the {KNN_K} nearest suppliers within
    RADIUS_KM of each customer. BOUNDED by the radius is what makes the
    grid-blocked plan EXACT (plain kNN can't promise the 3×3 ring holds
    k neighbors; radius-bounded kNN only ranks pairs the radius join
    already proved complete). Plan: blocked pairs → per-customer
    row_number window — the window partitions by customer over candidate
    pairs only (cell-density bounded), never over the corpus. Ties break
    on the rounded-distance grid then supplier id, so ranks are
    deterministic cross-engine."""
    from pyspark.sql import Window

    sup = with_coords(
        load_table(spark, "supplier", sf_dir).select("s_suppkey"), "s_suppkey"
    )
    cust = with_coords(
        load_table(spark, "customer", sf_dir).select("c_custkey"), "c_custkey"
    )
    pairs = radius_pairs_blocked(cust, "c_custkey", sup, "s_suppkey", RADIUS_KM)
    w = Window.partitionBy("c_custkey").orderBy("d_km", "s_suppkey")
    return (
        pairs.withColumn("knn_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("knn_rank") <= KNN_K)
        .select("c_custkey", "s_suppkey", "d_km", "knn_rank")
    )


def radius_pairs_blocked(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    radius_km: float,
) -> DataFrame:
    """(left_key, right_key, d_km) pairs within radius_km, via grid
    blocking. Both inputs carry lat/lon/cell_lat/cell_lon (with_coords
    or hand-built in tests). Correct only while radius_km stays under
    the minimum lon-cell width in the data's lat range (55.6 km at
    ±60°) — callers widening the radius must widen the probe ring."""
    probe = (
        left.withColumn("dlat", F.expr("explode(array(-1, 0, 1))"))
        .withColumn("dlon", F.expr("explode(array(-1, 0, 1))"))
        .select(
            left_key,
            "lat",
            "lon",
            (F.col("cell_lat") + F.col("dlat")).alias("p_cell_lat"),
            # wrap lon cells across the antimeridian: cell -181 -> 179
            (
                F.pmod(F.col("cell_lon") + F.col("dlon") + F.lit(180), F.lit(360))
                - F.lit(180)
            ).alias("p_cell_lon"),
        )
    )
    d = haversine_km(F.col("lat"), F.col("lon"), F.col("c_lat"), F.col("c_lon"))
    return (
        probe.join(
            right.select(
                right_key,
                F.col("cell_lat").alias("p_cell_lat"),
                F.col("cell_lon").alias("p_cell_lon"),
                F.col("lat").alias("c_lat"),
                F.col("lon").alias("c_lon"),
            ),
            ["p_cell_lat", "p_cell_lon"],
        )
        .select(left_key, right_key, d.alias("d_km"))
        .filter(F.col("d_km") <= F.lit(radius_km))
    )
