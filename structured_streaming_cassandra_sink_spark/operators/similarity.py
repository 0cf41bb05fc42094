"""Similarity search over embeddings — brute-force top-k, LSH-bucketed ANN,
cosine near-dup pairs (north-star LLM-data ops).

Three shapes:
- ``sim_search_topk``: exact cosine top-k, query side broadcast. The
  baseline; at 100 TB this is ONE scan of the corpus per query batch
  (not per query) — queries ride along as a broadcast literal/table and
  the per-partition heap (window row_number) avoids a global sort.
- ``sim_search_ann_lsh``: random-hyperplane signatures bucket the corpus;
  probes touch only matching buckets. Linear-scan-free; probabilistic
  (recall pinned in tests vs brute force).
- ``dedup_embedding_cosine``: pairwise near-dup detection, blocked by
  label (the provided partition key) to avoid the all-pairs product.

All dot products are Catalyst higher-order functions in DOUBLE (see
functions/vectorfns.py) — reproducible vs the oracle and JVM-side. A
pandas-UDF batched-matmul variant exists for the genuinely compute-bound
case (the `udf_surface` query below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectorfns import as_double, cosine, dot, norm
from ..plans.registry import query
from ..sources import load_table, spread

N_QUERIES = 5      # vec_id < 5 are the probe vectors
TOP_K = 10
LSH_PLANES = 6     # bits per hash table (2^6 = 64 buckets)
LSH_TABLES = 4     # independent tables; candidates = union of bucket hits
COS_THRESHOLD = 0.4


def _corpus_and_queries(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    emb = spread(load_table(spark, "embeddings", sf_dir))
    queries_df = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
    return corpus, queries_df




@query(
    "sim_search_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
               FROM embeddings WHERE vec_id < {N_QUERIES}),
         c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {N_QUERIES}),
         sims AS (
           SELECT q.query_id, c.vec_id,
                  round(list_cosine_similarity(qvec::DOUBLE[], embedding::DOUBLE[]), 6) AS cos_sim
           FROM q, c)
    SELECT query_id, vec_id, cos_sim,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_sim DESC, vec_id) AS rnk
    FROM sims
    QUALIFY rnk <= {TOP_K}
    """,
)
def sim_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-{TOP_K} for {N_QUERIES} probe vectors.

    Plan shape: BroadcastNestedLoopJoin (queries are tiny) over one corpus
    scan, then a per-query window top-k. Ranking uses the ROUNDED cosine
    (6 dp) with vec_id tie-break so ordering is engine-portable."""
    corpus, queries_df = _corpus_and_queries(spark, sf_dir)
    # Norms computed ONCE per row (corpus-linear), not once per pair:
    # same expression tree as cosine() so values are bit-identical.
    c = corpus.select(
        "vec_id", as_double(F.col("embedding")).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    q = queries_df.select(
        "query_id", as_double(F.col("qvec")).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    sim = F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6)
    joined = c.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id", sim.alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "vec_id", "cos_sim", "rnk")
    )


def hyperplane_signature(vec_col: str, planes: list[list[float]]):
    """Sign-bit signature: bit p = (vec . plane_p) >= 0. Planes are a
    deterministic driver-side constant (seeded numpy), shipped as
    literals — at scale they'd be a broadcast variable.

    Two deliberate shape choices, both measured:
    - the dot is a higher-order FOLD (unrolling tables x planes x dim
      literal terms OOMs codegen under a default-heap driver);
    - the whole signature is ONE SQL string handed to F.expr — building
      it from per-literal Column objects costs thousands of py4j round
      trips and dominated wall time as driver-side plan construction.
    """
    def plane_dot(p: list[float]) -> str:
        arr = ",".join(f"{x!r}D" for x in p)
        return (
            f"aggregate(zip_with(cast({vec_col} AS array<double>), array({arr}), "
            f"(a, b) -> a * b), 0D, (acc, x) -> acc + x)"
        )

    bits = " + ".join(
        f"IF({plane_dot(p)} >= 0, {1 << i}, 0)" for i, p in enumerate(planes)
    )
    return F.expr(bits)


def _planes(dim: int = 64, n: int = LSH_PLANES, table: int = 0) -> list[list[float]]:
    import numpy as np

    rng = np.random.default_rng(12345 + table)
    return rng.standard_normal((n, dim)).astype(float).tolist()


@query("sim_search_ann_lsh")  # rows-only: bucketing is probabilistic machinery;
# recall vs sim_search_topk is pinned in tests/test_similarity.py
def sim_search_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via multi-table random-hyperplane LSH: L independent signatures
    bucket the corpus; a query's candidates are the union of its L bucket
    hits; exact cosine re-ranks candidates. Touches ~L/2^bits of the
    corpus instead of all of it. At 100 TB the bucketed corpus is written
    partitioned by (table, signature) so a probe is a partition-pruned
    scan, not a full pass."""
    corpus, queries_df = _corpus_and_queries(spark, sf_dir)
    all_planes = [_planes(table=t) for t in range(LSH_TABLES)]

    def with_sigs(df: DataFrame, vec_col: str) -> DataFrame:
        # Explode the TABLE ID, then pick that table's signature with a
        # lazy CASE — exploding an inline array of all L signature structs
        # makes Generate re-evaluate every signature per output row (L×
        # waste; see operators/dedup.py shingle_rows for the same rule).
        ex = df.select(
            "*", F.explode(F.array(*[F.lit(t) for t in range(len(all_planes))])).alias("t")
        )
        sig = None
        for t, planes in enumerate(all_planes):
            s = hyperplane_signature(vec_col, planes)
            sig = F.when(F.col("t") == t, s) if sig is None else sig.when(F.col("t") == t, s)
        return ex.select(*df.columns, "t", sig.alias("sig"))

    csig = with_sigs(corpus, "embedding")
    qsig = with_sigs(queries_df, "qvec")
    candidates = (
        csig.join(F.broadcast(qsig), ["t", "sig"])
        .select("query_id", "vec_id", "qvec", "embedding")
        .dropDuplicates(["query_id", "vec_id"])  # a pair may collide in several tables
    )
    sim = F.round(cosine(as_double(F.col("qvec")), as_double(F.col("embedding"))), 6)
    scored = candidates.select("query_id", "vec_id", sim.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "vec_id", "cos_sim", "rnk")
    )


@query(
    "dedup_embedding_cosine",
    f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= {COS_THRESHOLD}
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within label blocks. The label
    equi-join keys the shuffle, so the pairwise product happens only
    inside blocks — the blocked/banded pattern that replaces O(n²) at
    scale (with LSH signatures as blocks when no natural key exists)."""
    emb = spread(load_table(spark, "embeddings", sf_dir))
    # Per-row norm precompute: the pairwise stage does ONE dot fold per
    # pair instead of three (dot + both norms) — measured ~8x on the
    # blocked self-join. Same fold order, so values are bit-identical.
    e = emb.select(
        "vec_id", "label", as_double(F.col("embedding")).alias("v")
    ).withColumn("nv", norm(F.col("v")))
    a = e.alias("a")
    b = e.alias("b")
    sim = F.round(
        dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nv") * F.col("b.nv")), 6
    )
    return (
        # No broadcast hint: under the autoBroadcastJoinThreshold Catalyst
        # broadcasts on its own; at corpus scale this must stay a shuffle
        # hash join on label (hinting broadcast would OOM a real cluster).
        a.join(
            b,
            (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= COS_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# Pandas-UDF escape hatch (the documented slow path, used when the math
# genuinely needs numpy — here: batched matmul top-k)
# ---------------------------------------------------------------------------
@query("udf_surface")  # rows-only: demonstrates the Arrow-batched UDF surface
def udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas batched cosine: each Arrow batch of corpus vectors is
    one numpy matmul against the (broadcast) query matrix. ~10-100x a
    row-at-a-time Python UDF; still slower than the Catalyst expression
    path for dim=64 — kept as the template for heavy per-row math."""
    import numpy as np
    import pandas as pd

    corpus, queries_df = _corpus_and_queries(spark, sf_dir)
    qrows = queries_df.collect()  # N_QUERIES rows — driver-side tiny constant
    qids = np.array([r.query_id for r in qrows])
    qmat = np.array([r.qvec for r in qrows], dtype=np.float64)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)

    def best_query(batches):
        for pdf in batches:
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ qnorm.T  # (batch, n_queries)
            best = sims.argmax(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "best_query_id": qids[best],
                    "best_cos": np.round(sims[np.arange(len(best)), best], 6),
                }
            )

    return corpus.mapInPandas(
        best_query, "vec_id long, best_query_id long, best_cos double"
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — KMeans-partitioned corpus, nprobe cell scan
# ---------------------------------------------------------------------------
IVF_NLIST = 16   # centroids / cells
IVF_NPROBE = 4   # cells scanned per query


@query("sim_search_ann_ivf")  # rows-only: index structure is probabilistic
# machinery; recall vs brute force is pinned in tests/test_similarity.py
def sim_search_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: seeded KMeans partitions the corpus into {IVF_NLIST}
    cells; each query scans only its {IVF_NPROBE} nearest cells, exact
    cosine re-ranks the survivors. The second standard ANN family next to
    hyperplane LSH (`sim_search_ann_lsh`): LSH needs no training and
    handles inserts trivially; IVF adapts to the data distribution and
    scans a tunable fraction (nprobe/nlist) of the corpus.

    Scale: the fitted centroids are a tiny broadcast model; the corpus is
    written partitioned by cell id, so a probe is a partition-pruned scan
    of nprobe/nlist of the data (here: a cell-id equi-join)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus, queries_df = _corpus_and_queries(spark, sf_dir)
    featurized = corpus.withColumn(
        "features", array_to_vector(as_double(F.col("embedding")))
    )
    # maxIter=5: centroid QUALITY barely moves after a few Lloyd rounds
    # for bucketing purposes (recall is pinned in tests) and the fit is
    # this query's dominant cost — index build time, amortized over every
    # probe in production, paid per call here.
    model = KMeans(k=IVF_NLIST, seed=42, maxIter=5).fit(featurized)
    assigned = model.transform(featurized).select(
        "vec_id", "embedding", F.col("prediction").alias("cell")
    )

    # Probe assignment: rank cells per query by centroid distance. The
    # centroid table is IVF_NLIST driver-side rows — a broadcast literal.
    centroids = [
        (cid, [float(x) for x in c]) for cid, c in enumerate(model.clusterCenters())
    ]
    cent_df = spark.createDataFrame(centroids, ["cell", "centroid"])
    qc = queries_df.crossJoin(F.broadcast(cent_df))
    # squared euclidean via the shared fold (argmin is the same for cosine
    # on normalized data; distance choice only shifts recall, verified in tests)
    diff_dot = dot(
        F.zip_with(as_double(F.col("qvec")), F.col("centroid"), lambda a, b: a - b),
        F.zip_with(as_double(F.col("qvec")), F.col("centroid"), lambda a, b: a - b),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("dist2"), F.col("cell"))
    probes = (
        qc.select("query_id", "qvec", "cell", diff_dot.alias("dist2"))
        .withColumn("prk", F.row_number().over(wq))
        .filter(F.col("prk") <= IVF_NPROBE)
        .select("query_id", "qvec", "cell")
    )

    candidates = assigned.join(F.broadcast(probes), "cell")
    c_n = candidates.withColumn("cn", norm(as_double(F.col("embedding")))).withColumn(
        "qn", norm(as_double(F.col("qvec")))
    )
    sim = F.round(
        dot(as_double(F.col("qvec")), as_double(F.col("embedding")))
        / (F.col("qn") * F.col("cn")),
        6,
    )
    scored = c_n.select("query_id", "vec_id", sim.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "vec_id", "cos_sim", "rnk")
    )


@query("dedup_embedding_lsh")  # rows-only: LSH blocking is probabilistic;
# recall vs driver-side exact ground truth is pinned in tests
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs WITHOUT a natural blocking key — the
    common case for real corpora. Random-hyperplane signatures become the
    block key: vectors pair only within a (table, signature) bucket, so
    the candidate count is Σ bucket² instead of n², then exact cosine
    (precomputed norms) keeps pairs >= {COS_THRESHOLD}. Recall comes from
    L independent tables, exactly like `sim_search_ann_lsh`; at 100 TB
    the bucket id is the shuffle key."""
    # Wider-recall parameters than the ANN query: pair recall at angle θ
    # is 1-(1-(1-θ/π)^planes)^tables; the {COS_THRESHOLD} threshold
    # (θ≈66°) needs SHORT signatures (4 bits) and more tables (8) to
    # reach ~75% — the ANN setting (6×4) would catch only ~23% of pairs.
    # Production dedup thresholds (~0.9, θ≈26°) tolerate longer
    # signatures and fewer tables; tune per threshold with this formula.
    planes_per_table, n_tables = 4, 8
    emb = spread(load_table(spark, "embeddings", sf_dir))
    e = emb.select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    ).withColumn("nv", norm(F.col("v")))
    all_planes = [
        _planes(n=planes_per_table, table=100 + t) for t in range(n_tables)
    ]
    ex = e.select(
        "*", F.explode(F.array(*[F.lit(t) for t in range(n_tables)])).alias("t")
    )
    sig = None
    for t, planes in enumerate(all_planes):
        s = hyperplane_signature("v", planes)
        sig = F.when(F.col("t") == t, s) if sig is None else sig.when(F.col("t") == t, s)
    buckets = ex.select("vec_id", "v", "nv", "t", sig.alias("sig"))
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
            F.col("a.nv").alias("na"),
            F.col("b.nv").alias("nb"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    sim = F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return (
        cand.withColumn("cos_sim", sim)
        .filter(F.col("cos_sim") >= COS_THRESHOLD)
        .select("vec_a", "vec_b", "cos_sim")
    )
