"""Semantic invariants for the clustering / sketch / survival additions
(oracle parity is tools/check.py's job; these pin the math)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from structured_streaming_cassandra_sink_spark.operators.clustering import (
    K_MEANS,
    PQ_K,
    PQ_M,
    kmeans_lloyd,
    pq_encode,
)
from structured_streaming_cassandra_sink_spark.operators.sketches import (
    countmin_sketch_report,
)
from structured_streaming_cassandra_sink_spark.operators.timeseries import (
    KM_CUTOFF_H,
    survival_kaplan_meier,
)
from structured_streaming_cassandra_sink_spark.operators.text import (
    ngram_novelty_score,
)


def test_kmeans_partitions_corpus(spark, sf_dir):
    out = kmeans_lloyd(spark, sf_dir).collect()
    n_vecs = len({r.vec_id for r in out})
    assert len(out) == n_vecs  # exactly one cluster per vector
    assert {r.cluster for r in out} <= set(range(K_MEANS))
    assert all(r.dist >= 0.0 for r in out)


def test_kmeans_iteration_reduces_inertia(spark, sf_dir):
    """Lloyd monotonicity: total inertia after 2 updates <= after 0.
    (Rounded centroids perturb the guarantee by <1e-6 per coordinate —
    assert with that slack.)"""
    from structured_streaming_cassandra_sink_spark.functions.vectorfns import (
        as_double,
    )
    from structured_streaming_cassandra_sink_spark.operators.clustering import (
        _assign,
        _init_centroids,
        kmeans_assignments,
    )
    from structured_streaming_cassandra_sink_spark.sources import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    vecs = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    c0 = sorted(
        (r["cluster"], list(r["c"]))
        for r in _init_centroids(vecs, K_MEANS).collect()
    )
    init = _assign(vecs, c0)
    i0 = init.agg(F.sum("d")).first()[0]
    final = kmeans_assignments(vecs)
    i2 = final.agg(F.sum("dist")).first()[0]
    assert i2 <= i0 + 1e-3


def test_pq_codes_in_range_and_err_nonneg(spark, sf_dir):
    out = pq_encode(spark, sf_dir).collect()
    for r in out:
        for m in range(PQ_M):
            assert 0 <= r[f"code{m}"] < PQ_K
        assert r.recon_err >= 0.0
    # the codebook rows themselves reconstruct exactly
    by_id = {r.vec_id: r for r in out}
    low_ids = sorted(by_id)[:PQ_K]
    for code, vid in enumerate(low_ids):
        r = by_id[vid]
        assert r.recon_err == 0.0
        assert [r[f"code{m}"] for m in range(PQ_M)] == [code] * PQ_M


def test_countmin_guarantees_hold(spark, sf_dir):
    rows = countmin_sketch_report(spark, sf_dir).collect()
    assert rows and all(r.est_ge_exact and r.est_within_eps for r in rows)


def test_kaplan_meier_monotone(spark, sf_dir):
    rows = sorted(
        survival_kaplan_meier(spark, sf_dir).collect(), key=lambda r: r.t_hours
    )
    assert rows[0].surv <= 1.0
    for a, b in zip(rows, rows[1:]):
        assert b.surv <= a.surv + 1e-9  # survival never increases
        assert b.n_risk < a.n_risk  # risk set strictly shrinks
    assert all(0 <= r.t_hours <= KM_CUTOFF_H for r in rows)


def test_novelty_bounds_and_first_doc(spark, sf_dir):
    rows = ngram_novelty_score(spark, sf_dir).collect()
    assert all(0.0 <= r.novel_frac <= 1.0 for r in rows)
    assert all(r.n_novel <= r.n_shingles for r in rows)
    first = min(rows, key=lambda r: r.doc_id)
    assert first.novel_frac == 1.0  # the earliest doc contributed all its shingles


def test_dbscan_grid_known_layout(spark, tmp_path):
    """Hand-built layout: two dense blobs separated by > eps of empty
    grid, one point adjacent to a blob (border), one far point (noise)."""
    import os

    from structured_streaming_cassandra_sink_spark.operators.clustering import (
        DBSCAN_EPS,
        DBSCAN_MINPTS,
        dbscan_grid_clusters,
    )

    eps = DBSCAN_EPS
    rows = []
    vid = 0
    # blob A: minPts points inside cell (0,0)
    for _ in range(DBSCAN_MINPTS):
        rows.append((vid, [eps * 0.5, eps * 0.5] + [0.0] * 62, 0)); vid += 1
    # blob B: minPts points inside cell (10,10) — far from A
    for _ in range(DBSCAN_MINPTS):
        rows.append((vid, [eps * 10.5, eps * 10.5] + [0.0] * 62, 1)); vid += 1
    # border point: alone in cell (1,1), adjacent to A's core cell
    border_id = vid
    rows.append((vid, [eps * 1.5, eps * 1.5] + [0.0] * 62, 0)); vid += 1
    # noise: alone in cell (20,20)
    noise_id = vid
    rows.append((vid, [eps * 20.5, eps * 20.5] + [0.0] * 62, 2)); vid += 1

    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    td = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(td, "embeddings.parquet"))
    got = {r.vec_id: (r.cluster, r.role) for r in dbscan_grid_clusters(spark, td).collect()}
    a_cluster = got[0][0]
    b_cluster = got[DBSCAN_MINPTS][0]
    assert a_cluster != b_cluster  # separated blobs are distinct clusters
    assert all(got[i] == (a_cluster, "core") for i in range(DBSCAN_MINPTS))
    assert all(
        got[i] == (b_cluster, "core")
        for i in range(DBSCAN_MINPTS, 2 * DBSCAN_MINPTS)
    )
    assert got[border_id] == (a_cluster, "border")
    assert got[noise_id] == (-1, "noise")
