"""Clustering & vector-compression operators — k-means (Lloyd) and
product quantization over the embeddings table.

These close the loop the ANN family opened (similarity.py): IVF needs a
coarse quantizer (k-means), and production vector stores ship PQ codes,
not raw floats. Both are expressed as DataFrame plans, generalizing the
reference's aggregate surface (cassandra_sink.scala:113-120) to vector
data:

- **k-means assignment is a 1-row broadcast ride-along, never a corpus
  shuffle.** The centroid side is K rows; each Lloyd iteration is
  `corpus x broadcast(centroid row) -> argmin -> (cluster, dim) avg`,
  i.e. one scan of the once-checkpointed corpus + one narrow shuffle per
  iteration. At 100 TB the corpus never moves — only K·dim doubles do,
  collected per round (a bounded driver constant) and re-injected as the
  next round's broadcast row, which also flattens the per-iteration
  lineage (the same reason dedup.connected_components checkpoints).
- **Determinism contract (the oracle depends on it).** Init centroids
  are the K lowest vec_ids (rank order = cluster id); every distance is
  the same sequential zip_with/aggregate fold as vectorfns.dot, ROUNDED
  to 6 dp BEFORE the argmin with cluster-id tie-break; updated centroid
  coordinates are rounded to 6 dp. Rounding before comparison is what
  makes Spark's and DuckDB's float partial-aggregation orders agree on
  every assignment (registry FP-parity contract; same convention as
  the mleval family).
- **PQ**: M subspaces x K codes; codebooks are deterministic (the
  subvectors of the K lowest vec_ids), assignment is the same rounded
  argmin per subspace. Encoded corpus = M uint8-sized codes per vector
  instead of dim floats — the 100 TB story is that re-ranking reads
  codes (M bytes) and only the final top-k touches raw vectors.

Both oracles unroll the SAME fixed iteration count in DuckDB CTEs, so
the driver check is a full value-hash match, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectorfns import as_double
from ..plans.registry import query
from ..sources import load_table, spread

DIM = 64            # embeddings.embedding length (FIXTURES.md)
K_MEANS = 4         # clusters; init = the K lowest vec_ids
LLOYD_ITERS = 2     # fixed update steps (oracle unrolls the same two)
PQ_M = 4            # product-quantization subspaces
PQ_SUBDIM = DIM // PQ_M
PQ_K = 4            # codes per subspace; codebook = K lowest vec_ids
DIST_DP = 6         # round distances/centroids to 6 dp before argmin


def _sqdist(a: F.Column, b: F.Column) -> F.Column:
    """Sequential-fold squared L2 — same fold shape as vectorfns.dot so
    the accumulation order matches the oracle's list_sum exactly."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _init_centroids(vecs: DataFrame, k: int) -> DataFrame:
    """(cluster, c): the k lowest vec_ids in id order — deterministic,
    oracle-reproducible 'training sample'. k rows: driver-safe."""
    low = vecs.orderBy("vec_id").limit(k)
    # rank within k rows — trivially cheap, and row_number over the
    # k-row frame is deterministic because vec_id is unique.
    from pyspark.sql import Window

    w = Window.orderBy("vec_id")
    return low.select(
        (F.row_number().over(w) - 1).alias("cluster"), F.col("v").alias("c")
    )


def _assign(vecs: DataFrame, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """(vec_id, cluster, d, v): nearest centroid per vector under the
    ROUNDED distance with cluster-id tie-break. The K centroids arrive
    as a DRIVER-SIDE LIST (bounded: K rows per iteration) and ride along
    as a single broadcast 1-row relation (one array column per cluster),
    so assignment is a broadcast product with a 1-row side — effectively
    a PURE MAP: one projection computing K folds and a lexicographic
    least(), with no groupBy(vec_id) that drags the full DIM-double
    vector payload through a shuffle (the pre-r6 shape shuffled
    corpus x vector three times per run; this shuffles nothing).

    Broadcast columns instead of the r6 LITERAL arrays (optimization
    r10): embedding the K·DIM doubles as literals made every iteration's
    generated code UNIQUE, so each Lloyd round recompiled the same
    64-term fold projection from scratch (and evicted other queries from
    the 100-entry codegen cache in full-registry runs — kmeans measured
    6.1 s interleaved vs 3.8 s solo). With column references the
    generated source is identical across iterations and runs; values
    live in the broadcast row. Same _sqdist fold over the same doubles,
    so every rounded distance is bit-identical to the literal form and
    the oracle's list_sum (diffed row-equal before the swap)."""
    spark = vecs.sparkSession
    cents = sorted(cents)
    cdf = spark.createDataFrame(
        [tuple(list(c) for _, c in cents)],
        ", ".join(f"__c{cl} array<double>" for cl, _ in cents),
    )
    structs = [
        F.struct(
            F.round(_sqdist(F.col("v"), F.col(f"__c{cl}")), DIST_DP).alias("d"),
            F.lit(int(cl)).alias("cluster"),
        )
        for cl, _ in cents
    ]
    # least(struct...) is lexicographic on (d, cluster) — unique per row.
    return (
        vecs.crossJoin(F.broadcast(cdf))
        .select("vec_id", "v", F.least(*structs).alias("b"))
        .select(
            "vec_id",
            F.col("b.cluster").alias("cluster"),
            F.col("b.d").alias("d"),
            "v",
        )
    )


def _update(assign: DataFrame) -> list[tuple[int, list[float]]]:
    """Per-dimension means of the assigned vectors, rounded to
    {DIST_DP} dp (both engines round, so partial-agg order drift cannot
    flip a later argmin), returned as the driver-side centroid list the
    next _assign consumes (K x DIM scalars — bounded).

    Narrow posexplode shape (optimization r10): the r6-r9 form was ONE
    64-wide round(avg(v[i])) aggregate — 64 agg expressions whose
    generated code is large enough that re-compiling it per iteration
    (the 100-entry codegen cache cannot hold 305 interleaved queries)
    dominated each Lloyd round. (cluster, dim)-keyed avg over a
    posexplode is a generic 2-column aggregate (tiny codegen, K*DIM=256
    result rows) and measured 4.2 s -> 2.6 s for the whole query,
    output-identical: the same values feed the same round(avg) per
    (cluster, dim), under the same rounded-grid tolerance for partial
    order the wide form already relied on."""
    rows = (
        assign.select("cluster", F.posexplode("v").alias("i", "e"))
        .groupBy("cluster", "i")
        .agg(F.round(F.avg("e"), DIST_DP).alias("c"))
        .collect()
    )
    cents: dict[int, dict[int, float]] = {}
    for r in rows:
        cents.setdefault(r["cluster"], {})[r["i"]] = r["c"]
    return sorted((cl, [d[i] for i in range(DIM)]) for cl, d in cents.items())


def kmeans_assignments(
    vecs: DataFrame, k: int = K_MEANS, iters: int = LLOYD_ITERS
) -> DataFrame:
    """Lloyd's algorithm, `iters` update steps from the deterministic
    init, returning the FINAL assignment (vec_id, cluster, dist).

    Per iteration: ONE corpus scan (map-side broadcast-centroid assign +
    K-group partial-agg update) whose K-row result is collected —
    a bounded driver-side constant, the same discipline as the probe
    sets — and re-injected as a 1-row broadcast for the next step.
    Collecting also flattens the per-iteration lineage, replacing the
    pre-r6 localCheckpoint. The corpus projection is localCheckpointed
    once up front (r10): the iterations are inherently sequential
    driver-synced jobs, and without it every one of the k+2 jobs
    re-read the parquet and re-ran the spread() repartition."""
    vecs = vecs.localCheckpoint(eager=False)
    cents = sorted(
        (r["cluster"], list(r["c"]))
        for r in _init_centroids(vecs, k).collect()
    )
    for _ in range(iters):
        cents = _update(_assign(vecs, cents))
    final = _assign(vecs, cents)
    return final.select("vec_id", "cluster", F.col("d").alias("dist"))


# --------------------------------------------------------------------------
# Oracle SQL generators (DuckDB) — unroll the same fixed iterations.
# --------------------------------------------------------------------------
def _sql_sqdist(v: str, c: str) -> str:
    return (
        f"list_sum(list_transform(range({DIM}), "
        f"i -> ({v}[i+1] - {c}[i+1]) * ({v}[i+1] - {c}[i+1])))"
    )


def _sql_centroid_avg() -> str:
    return ", ".join(
        f"round(avg(v[{i + 1}]), {DIST_DP})" for i in range(DIM)
    )


def _kmeans_oracle() -> str:
    d0 = _sql_sqdist("v", "c")
    assign_tpl = """
    a{n} AS (
      SELECT vec_id, v, cluster, d FROM (
        SELECT vec.vec_id, vec.v, c{m}.cluster,
               round({dist}, {dp}) AS d,
               row_number() OVER (PARTITION BY vec.vec_id
                                  ORDER BY round({dist}, {dp}), c{m}.cluster) AS rn
        FROM vec, c{m}
      ) WHERE rn = 1
    )"""
    update_tpl = """
    c{n} AS (
      SELECT cluster, [{avgs}]::DOUBLE[] AS c
      FROM a{n} GROUP BY cluster
    )"""
    parts = [
        f"""
    vec AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
             embedding::DOUBLE[] AS c
      FROM embeddings ORDER BY vec_id LIMIT {K_MEANS}
    )"""
    ]
    for it in range(LLOYD_ITERS):
        parts.append(
            assign_tpl.format(n=it + 1, m=it, dist=d0, dp=DIST_DP)
        )
        parts.append(update_tpl.format(n=it + 1, avgs=_sql_centroid_avg()))
    final = assign_tpl.format(
        n=LLOYD_ITERS + 1, m=LLOYD_ITERS, dist=d0, dp=DIST_DP
    )
    parts.append(final)
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT vec_id, cluster, d AS dist FROM a{LLOYD_ITERS + 1}
    """
    )


@query("kmeans_lloyd", _kmeans_oracle())
def kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means (Lloyd), {LLOYD_ITERS} deterministic update steps over the
    embeddings corpus; output = final (vec_id, cluster, dist). The
    iterative-algorithm showcase next to connected_components and PCA:
    per iteration, ONE corpus scan — map-side literal-centroid
    assignment fused into the K-group partial-agg update — and only the
    K-row centroid table ever reaches the driver (collected and
    re-injected as literals; the corpus is never collected and, since
    r6, never shuffled either)."""
    emb = spread(load_table(spark, "embeddings", sf_dir))
    vecs = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    return kmeans_assignments(vecs)


# --------------------------------------------------------------------------
# Product quantization
# --------------------------------------------------------------------------
def _subvectors(vecs: DataFrame, n_sub: int = PQ_M) -> DataFrame:
    """(vec_id, m, sv): split each vector into n_sub contiguous
    DIM/n_sub-length subvectors. Inline explode of a LITERAL-indexed
    struct array — the slices are computed per output row but the array
    has n_sub elements, so there is no Generate blow-up."""
    subdim = DIM // n_sub
    subs = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.slice(F.col("v"), m * subdim + 1, subdim).alias("sv"),
            )
            for m in range(n_sub)
        ]
    )
    return vecs.select("vec_id", F.explode(subs).alias("s")).select(
        "vec_id", F.col("s.m").alias("m"), F.col("s.sv").alias("sv")
    )


def _codebook(vecs: DataFrame, k: int = PQ_K, n_sub: int = PQ_M) -> DataFrame:
    """(m, code, cv): deterministic codebook — the subvectors of the
    k lowest vec_ids, code = id rank. n_sub * k rows."""
    from pyspark.sql import Window

    low = vecs.orderBy("vec_id").limit(k)
    w = Window.orderBy("vec_id")
    ranked = low.select((F.row_number().over(w) - 1).alias("code"), "v")
    return _subvectors(ranked.withColumnRenamed("code", "vec_id"), n_sub).select(
        F.col("m"), F.col("vec_id").alias("code"), F.col("sv").alias("cv")
    )


def pq_code_rows(vecs: DataFrame, book: DataFrame, n_sub: int = PQ_M) -> DataFrame:
    """(vec_id, m, code, d): nearest code per (vector, subspace) under
    the rounded distance with code-id tie-break — the melted encoding
    the ADC search consumes directly."""
    sub = _subvectors(vecs, n_sub)
    d = F.round(_sqdist(F.col("sv"), F.col("cv")), DIST_DP)
    pairs = sub.join(F.broadcast(book), "m").select(
        "vec_id", "m", "code", d.alias("d")
    )
    best = pairs.groupBy("vec_id", "m").agg(
        F.min(F.struct("d", "code")).alias("b")
    )
    return best.select(
        "vec_id", "m", F.col("b.code").alias("code"), F.col("b.d").alias("d")
    )


def pq_codes(vecs: DataFrame) -> DataFrame:
    """(vec_id, code0..code{PQ_M-1}, recon_err): nearest-code id per
    subspace + summed (rounded) squared reconstruction error."""
    per_sub = pq_code_rows(vecs, _codebook(vecs))
    code_cols = [
        F.max(F.when(F.col("m") == m, F.col("code"))).alias(f"code{m}")
        for m in range(PQ_M)
    ]
    return per_sub.groupBy("vec_id").agg(
        # round(sum, 6) not 4: the addends are 6dp-rounded, so the true
        # sum lies ON the 6dp grid — 6dp re-rounding only cancels binary
        # noise and can never straddle a decision boundary (a 4dp round
        # hit exactly that: one row at ...05 split 1.5241 vs 1.524).
        *code_cols, F.round(F.sum("d"), 6).alias("recon_err")
    )


def _pq_oracle() -> str:
    dist = (
        f"list_sum(list_transform(range({PQ_SUBDIM}), "
        f"i -> (sv[i+1] - cv[i+1]) * (sv[i+1] - cv[i+1])))"
    )
    sub_select = " UNION ALL ".join(
        f"SELECT vec_id, {m} AS m, v[{m * PQ_SUBDIM + 1}:{(m + 1) * PQ_SUBDIM}] AS sv FROM vec"
        for m in range(PQ_M)
    )
    code_cols = ", ".join(
        f"max(CASE WHEN m = {m} THEN code END) AS code{m}" for m in range(PQ_M)
    )
    return f"""
    WITH vec AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    low AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
      FROM vec ORDER BY vec_id LIMIT {PQ_K}
    ),
    sub AS ({sub_select}),
    book AS (
      {" UNION ALL ".join(
          f"SELECT {m} AS m, code, v[{m * PQ_SUBDIM + 1}:{(m + 1) * PQ_SUBDIM}] AS cv FROM low"
          for m in range(PQ_M)
      )}
    ),
    best AS (
      SELECT vec_id, m, code, d FROM (
        SELECT sub.vec_id, sub.m, book.code,
               round({dist}, {DIST_DP}) AS d,
               row_number() OVER (PARTITION BY sub.vec_id, sub.m
                                  ORDER BY round({dist}, {DIST_DP}), book.code) AS rn
        FROM sub JOIN book USING (m)
      ) WHERE rn = 1
    )
    SELECT vec_id, {code_cols}, round(sum(d), 6) AS recon_err
    FROM best GROUP BY vec_id
    """


@query("pq_encode", _pq_oracle())
def pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding: {PQ_M} subspaces x {PQ_K} codes
    (deterministic codebook), output = code ids + reconstruction error.
    The compression stage a 100 TB vector store runs once per snapshot:
    dim doubles -> {PQ_M} small ints per vector; the plan is one explode
    + broadcast codebook join + two bounded aggregations."""
    emb = spread(load_table(spark, "embeddings", sf_dir))
    vecs = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    return pq_codes(vecs)


# ---------------------------------------------------------------------------
# Grid-DBSCAN: density clustering on an eps-grid
# ---------------------------------------------------------------------------
DBSCAN_EPS = 0.05     # grid cell side over embedding dims 1-2
DBSCAN_MINPTS = 4     # core-cell density threshold
# cell_id = cx * 2^32 + (cy & (2^32-1)) — bit-packing is collision-free
# for |cx|,|cy| < 2^31 (any sane eps/embedding scale), unlike a
# decimal-offset encoding which silently wraps outside its offset range
_CELL_SHIFT = 4294967296
_CELL_MASK = 4294967295


def _dbscan_oracle() -> str:
    return f"""
    WITH pts AS (
      SELECT vec_id,
             CAST(floor(embedding[1]::DOUBLE / {DBSCAN_EPS}) AS BIGINT) AS cx,
             CAST(floor(embedding[2]::DOUBLE / {DBSCAN_EPS}) AS BIGINT) AS cy
      FROM embeddings
    ),
    cells AS (
      SELECT cx * {_CELL_SHIFT} + (cy & {_CELL_MASK}) AS cell,
             cx, cy, count(*) AS n
      FROM pts GROUP BY 1, 2, 3
    ),
    core AS (SELECT cell, cx, cy FROM cells WHERE n >= {DBSCAN_MINPTS}),
    edges AS (
      SELECT a.cell AS ca, b.cell AS cb
      FROM core a JOIN core b
        ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
    ),
    reach AS (
      WITH RECURSIVE r(cell, lbl) AS (
        SELECT cell, cell FROM core
        UNION
        SELECT e.ca, r.lbl FROM edges e JOIN r ON e.cb = r.cell
        WHERE r.lbl < e.ca
      )
      SELECT cell, min(lbl) AS comp FROM r GROUP BY cell
    ),
    -- border: point in a non-core cell adjacent (incl. own) to a core cell
    assign AS (
      SELECT p.vec_id,
             CASE WHEN rc.comp IS NOT NULL THEN rc.comp
                  ELSE (SELECT min(r2.comp)
                        FROM core c JOIN reach r2 ON c.cell = r2.cell
                        WHERE abs(c.cx - p.cx) <= 1 AND abs(c.cy - p.cy) <= 1)
             END AS comp,
             CASE WHEN rc.comp IS NOT NULL THEN 'core' END AS role0
      FROM pts p
      LEFT JOIN reach rc
        ON rc.cell = p.cx * {_CELL_SHIFT} + (p.cy & {_CELL_MASK})
    )
    SELECT vec_id,
           coalesce(comp, -1) AS cluster,
           coalesce(role0, CASE WHEN comp IS NOT NULL THEN 'border'
                                ELSE 'noise' END) AS role
    FROM assign
    """


@query("dbscan_grid_clusters", _dbscan_oracle())
def dbscan_grid_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-DBSCAN over embedding dims 1-2: quantize to an eps-grid,
    cells with >= minPts points are CORE, adjacent (8-neighborhood) core
    cells merge into clusters via connected components, points in
    non-core cells adjacent to a core cell are BORDER (inherit the min
    adjacent cluster id), everything else is NOISE (cluster -1). The
    density-clustering complement to kmeans_lloyd — no K, finds
    arbitrary-shape clusters, labels outliers. (Production would feed
    PCA dims from embedding_pca_project; dims 1-2 keep the oracle
    self-contained.)

    Scale shape: the grid collapse is one groupBy (cells ~ occupied
    boxes, not points); core-cell adjacency is an equi-join after a x9
    neighbor-offset explode (bounded fan-out, never a distance
    self-join); the CC runs on the CELL graph (orders of magnitude
    smaller than the point set) with the pointer-jumping engine; points
    join back by cell id — one shuffle on a bigint key. The classic
    point-level DBSCAN needs an eps-ball self-join; the grid variant is
    its scalable approximation (cell diameter eps*sqrt(2)), which is the
    variant a 100 TB pipeline actually runs.

    Determinism: floor() on exact float32->double casts, integer cell
    ids, min-label components, min-adjacent-cluster border assignment —
    no FP comparisons anywhere past the grid quantization."""
    from .dedup import connected_components

    emb = spread(load_table(spark, "embeddings", sf_dir))
    pts = emb.select(
        "vec_id",
        F.floor(F.element_at(as_double(F.col("embedding")), 1) / DBSCAN_EPS)
        .cast("bigint")
        .alias("cx"),
        F.floor(F.element_at(as_double(F.col("embedding")), 2) / DBSCAN_EPS)
        .cast("bigint")
        .alias("cy"),
    )
    cell_id = F.col("cx") * _CELL_SHIFT + F.col("cy").bitwiseAND(_CELL_MASK)
    # pts feeds the cell rollup AND the two point-assignment joins;
    # core feeds the neighbor explode, the edge join and core_comp —
    # materialize both once (the repo's multi-consumer rule)
    pts = pts.withColumn("cell", cell_id).localCheckpoint(eager=False)
    cells = pts.groupBy("cell", "cx", "cy").agg(F.count(F.lit(1)).alias("n"))
    core = (
        cells.filter(F.col("n") >= DBSCAN_MINPTS)
        .select("cell", "cx", "cy")
        .localCheckpoint(eager=False)
    )
    # x9 neighbor explode on one side, equi-join on shifted coords
    nbr = core.select(
        "cell",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cx") + dx).alias("nx"), (F.col("cy") + dy).alias("ny")
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("o"),
    ).select("cell", F.col("o.nx").alias("cx"), F.col("o.ny").alias("cy"))
    edges = nbr.join(core.withColumnRenamed("cell", "cell_b"), ["cx", "cy"]).select(
        F.col("cell").alias("src"), F.col("cell_b").alias("dst")
    )
    comp = connected_components(edges).withColumnRenamed("node", "cell")
    # core points inherit their cell's component
    with_core = pts.join(F.broadcast(comp), "cell", "left")
    # border: min component among the 9 neighboring cells that are core
    core_comp = core.join(F.broadcast(comp), "cell").select("cx", "cy", "comp")
    nbr_pts = with_core.filter(F.col("comp").isNull()).select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cx") + dx).alias("cx"), (F.col("cy") + dy).alias("cy")
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("o"),
    ).select("vec_id", F.col("o.cx").alias("cx"), F.col("o.cy").alias("cy"))
    border = (
        nbr_pts.join(F.broadcast(core_comp), ["cx", "cy"])
        .groupBy("vec_id")
        .agg(F.min("comp").alias("bcomp"))
    )
    # border is POINT-level (unbounded in corpus size) — a broadcast
    # here would materialize it on the driver at exactly the scale the
    # operator advertises; shuffle-join on vec_id instead (review
    # finding). Only the CELL-level tables broadcast.
    out = (
        with_core.join(border, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("comp", "bcomp", F.lit(-1)).alias("cluster"),
            F.when(F.col("comp").isNotNull(), "core")
            .when(F.col("bcomp").isNotNull(), "border")
            .otherwise("noise")
            .alias("role"),
        )
    )
    return out
