#!/usr/bin/env python
"""Generate an sf1-equivalent dataset: 10 key-shifted copies of sf0.1.

Purpose: extend SCALING_CURVES.md one decade past the driver-provided
testdata (sf0.001/0.01/0.1 = 100x) to 1000x overall, at a size where data
finally swamps the fixed per-job overhead that dominates the small SFs.
The testdata dirs are read-only, so the 10x set is DERIVED, deterministic,
and written to /tmp (not committed):

- dims (region nation customer supplier part): copied as-is — at any real
  scale factor the dims grow far slower than facts, and keeping them fixed
  preserves broadcast-join shapes.
- orders/lineitem: o_orderkey/l_orderkey offset by copy*max so the
  orders<->lineitem FK keeps working and keys stay unique.
- events: event_id AND user_id offset — scaling key cardinality (more
  users), not per-key series length, which is how event data actually
  grows.
- documents: doc_id offset; every WORD gets a per-copy prefix (c<i>_) so
  the near-dup pair structure replicates WITHIN each copy without welding
  the 10 copies into one giant cross-copy duplicate cluster (10 identical
  corpora would square the pair count and change the workload's CHARACTER,
  not just its scale). Note n_chars is left at its source value (words
  grew by 3 chars); the scaling harness only measures wall time.
- embeddings: vec_id offset, vectors unchanged — 10x corpus for scans;
  the resulting exact-duplicate vectors are harmless for the measured
  queries (ties break on vec_id deterministically).

Usage: python tools/gen_sf1eq.py [OUT_DIR] [--copies N] [--tables a,b,..]
       [--plant-every K]
       (default /tmp/sf1eq, 10 copies, all tables, plant every 50th)
Then:  python tools/scaling_curves.py --sf1eq OUT_DIR
       python tools/measure_lsh_recall.py OUT_DIR

The fifth decade (r8): --copies 100 --tables documents,embeddings builds
an sf10-EQUIVALENT for the heavy dedup/ANN/graph/tfidf families only
(their queries read just documents/embeddings + dims); generating 100x
fact tables nothing measures would only burn disk.

Planted near-dup twins (r9, verdict #2): every K-th embedding gets a
deterministic TWIN at a known cosine in [0.905, 0.995] — twin =
||x||*(cos(phi)*x_hat + sin(phi)*u_hat) with u a seeded gaussian
orthogonalized against x, so cos(twin, x) = cos(phi) EXACTLY (up to
float32 storage, recomputed after the cast and recorded). The sign-flip
corpus otherwise has NO pair >= 0.9 (within-copy max 0.601 measured on
sf0.1; different-base cross-copy <= 0.867 by the any-mask abs bound;
same-base cross-copy <= 0.872 under the actual md5 masks at 100
copies — bounds re-verified by measure_lsh_recall.py), so the planted
set plus a cheap twin-vs-everything rectangular sweep IS the complete
>= 0.9 ground truth — which makes dedup_embedding_lsh's
production-regime recall MEASURABLE instead of formula-derived. Ground
truth lands in OUT_DIR/planted_pairs.parquet (not a registered engine
table). Twin vec_ids live at 10^9 + base vec_id.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
COPIES = 10


def main() -> int:
    from pyspark.sql import functions as F

    from structured_streaming_cassandra_sink_spark.session import get_spark

    args = [a for a in sys.argv[1:]]
    copies = COPIES
    tables = {"orders", "lineitem", "events", "documents", "embeddings"}
    if "--copies" in args:
        i = args.index("--copies")
        copies = int(args[i + 1])
        del args[i : i + 2]
    if "--tables" in args:
        i = args.index("--tables")
        tables = set(args[i + 1].split(","))
        del args[i : i + 2]
    plant_every = 50
    if "--plant-every" in args:
        i = args.index("--plant-every")
        plant_every = int(args[i + 1])
        del args[i : i + 2]
    dst = args[0] if args else "/tmp/sf1eq"
    os.makedirs(dst, exist_ok=True)
    spark = get_spark(app_name="gen-sf1eq")
    spark.sparkContext.setLogLevel("ERROR")

    for t in "region nation customer supplier part".split():
        s, d = f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet"
        if os.path.isfile(s):
            shutil.copy(s, d)
        else:
            shutil.copytree(s, d, dirs_exist_ok=True)

    def write(df, name: str, n: int = 32) -> None:
        df.repartition(n).write.mode("overwrite").parquet(f"{dst}/{name}.parquet")

    cp = F.explode(F.array(*[F.lit(i) for i in range(copies)])).alias("cp")
    pscale = max(1, copies // COPIES)  # keep ~constant rows/file as copies grow

    if {"orders", "lineitem"} & tables:
        orders = spark.read.parquet(f"{SRC}/orders.parquet")
        omax = orders.agg(F.max("o_orderkey")).first()[0] + 1
        if "orders" in tables:
            write(
                orders.select("*", cp)
                .withColumn("o_orderkey", F.col("o_orderkey") + F.col("cp") * omax)
                .drop("cp"),
                "orders",
                32 * pscale,
            )
        if "lineitem" in tables:
            li = spark.read.parquet(f"{SRC}/lineitem.parquet")
            write(
                li.select("*", cp)
                .withColumn("l_orderkey", F.col("l_orderkey") + F.col("cp") * omax)
                .drop("cp"),
                "lineitem",
                32 * pscale,
            )

    if "events" in tables:
        ev = spark.read.parquet(f"{SRC}/events.parquet")
        emax = ev.agg(F.max("event_id")).first()[0] + 1
        umax = ev.agg(F.max("user_id")).first()[0] + 1
        write(
            ev.select("*", cp)
            .withColumn("event_id", F.col("event_id") + F.col("cp") * emax)
            .withColumn("user_id", F.col("user_id") + F.col("cp") * umax)
            .drop("cp"),
            "events",
            32 * pscale,
        )

    if "documents" in tables:
        docs = spark.read.parquet(f"{SRC}/documents.parquet")
        dmax = docs.agg(F.max("doc_id")).first()[0] + 1
        write(
            docs.select("*", cp)
            .withColumn("doc_id", F.col("doc_id") + F.col("cp") * dmax)
            .withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda w: F.concat(
                            F.lit("c"), F.col("cp").cast("string"), F.lit("_"), w
                        ),
                    ),
                    " ",
                ),
            )
            .drop("cp"),
            "documents",
            16 * pscale,
        )

    if "embeddings" in tables:
        import hashlib

        emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
        vmax = emb.agg(F.max("vec_id")).first()[0] + 1
        dim = len(emb.select("embedding").first()[0])

        # Per-copy SIGN-FLIP pattern (r8) — the embedding analogue of the
        # per-copy word prefix: a fixed ±1 vector per copy is an
        # orthogonal transform, so within-copy dot products, norms and
        # near-dup structure are EXACTLY preserved, while cross-copy
        # pairs decorrelate (masks differ in ~dim/2 positions → expected
        # cosine ~0). Without it the copies carry VERBATIM duplicate
        # vectors and any pair-emitting query (dedup_embedding_lsh)
        # welds the copies into one cluster whose pair OUTPUT grows
        # copies^2 — measured as a 25+-minute sf10eq grind that says
        # nothing about the operator. Copy 0 keeps the identity pattern
        # so the first slice stays byte-comparable to the source.
        def _signs(c: int) -> list[float]:
            if c == 0:
                return [1.0] * dim
            return [
                1.0
                if hashlib.md5(f"sf1eq-sign:{c}:{d}".encode()).digest()[0] & 1
                else -1.0
                for d in range(dim)
            ]

        sign_lattice = F.array(
            *[
                F.array(*[F.lit(s) for s in _signs(c)])
                for c in range(copies)
            ]
        )
        write(
            emb.select("*", cp)
            .withColumn("vec_id", F.col("vec_id") + F.col("cp") * vmax)
            .withColumn(
                "embedding",
                F.zip_with(
                    F.col("embedding"),
                    F.element_at(sign_lattice, F.col("cp") + 1),
                    lambda x, s: (x * s).cast("float"),
                ),
            )
            .drop("cp"),
            "embeddings",
            16 * pscale,
        )

    if "embeddings" in tables and plant_every > 0:
        plant_twins(dst, plant_every)

    for t in sorted(tables):
        print(t, spark.read.parquet(f"{dst}/{t}.parquet").count())
    return 0


def plant_twins(dst: str, plant_every: int) -> None:
    """Plant deterministic >=0.9-cosine twins (module docstring) and
    write the ground-truth pair table. Driver-side numpy: even sf10eq's
    200k x 64 floats is ~50 MB — generator tooling, not engine path."""
    import hashlib

    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = duckdb.sql(
        f"SELECT vec_id, embedding, label FROM '{dst}/embeddings.parquet/*.parquet'"
        f" WHERE vec_id % {plant_every} = 0 ORDER BY vec_id"
    ).fetchall()
    twin_ids, twins, labels, pairs = [], [], [], []
    for vec_id, emb, label in rows:
        x = np.asarray(emb, dtype=np.float64)
        nx = np.linalg.norm(x)
        seed = int.from_bytes(
            hashlib.md5(f"sf1eq-twin:{vec_id}".encode()).digest()[:8], "big"
        )
        rng = np.random.default_rng(seed)
        # target cosine in [0.905, 0.995]: clear of the 0.9 cut so the
        # float32 store and the engine's round(,6) cannot flip
        # membership, and spanning easy-to-hard collision probabilities
        target = 0.905 + 0.09 * rng.random()
        u = rng.standard_normal(x.shape[0])
        u -= (u @ x) / (nx * nx) * x
        u /= np.linalg.norm(u)
        t64 = nx * (target * x / nx + np.sqrt(1.0 - target * target) * u)
        t32 = t64.astype(np.float32)
        # the cosine AS STORED (float32), the value the engine sees
        stored = float(
            (t32.astype(np.float64) @ x)
            / (np.linalg.norm(t32.astype(np.float64)) * nx)
        )
        assert stored >= 0.9049, (vec_id, stored)
        tid = 10**9 + int(vec_id)
        twin_ids.append(tid)
        twins.append(t32)
        labels.append(label)
        pairs.append((int(vec_id), tid, stored))

    schema = pa.schema(
        [
            pa.field("vec_id", pa.int64()),
            pa.field("embedding", pa.list_(pa.float32())),
            pa.field("label", pa.int32()),
        ]
    )
    tbl = pa.table(
        {
            "vec_id": pa.array(twin_ids, pa.int64()),
            "embedding": pa.array([t.tolist() for t in twins], pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        },
        schema=schema,
    )
    pq.write_table(tbl, f"{dst}/embeddings.parquet/part-planted-twins.parquet")
    gt = pa.table(
        {
            "vec_a": pa.array([p[0] for p in pairs], pa.int64()),
            "vec_b": pa.array([p[1] for p in pairs], pa.int64()),
            "cos_stored": pa.array([p[2] for p in pairs], pa.float64()),
        }
    )
    pq.write_table(gt, f"{dst}/planted_pairs.parquet")
    print(f"planted {len(pairs)} twins (every {plant_every}th vec)")


if __name__ == "__main__":
    raise SystemExit(main())
