#!/usr/bin/env python
"""Interleaved in-session A/B of two code versions of the same query.

The decisive instrument on this box (r10 postmortem: full-bench totals on
IDENTICAL code drifted ±12% across one evening, so no two runs hours apart
are comparable). Protocol: ONE Spark session, both implementations of each
query run alternately (order flips per pass, bench.py-style), >=4 timed
samples each after an untimed warm-up, same noop-sink timing as bench.py.

Usage:
    python tools/ab_interleaved.py --old /tmp/repo_r9 q1 q2 ...
    python tools/ab_interleaved.py --old /tmp/repo_r9 --samples 6 q1

The OLD version is loaded from a git worktree checkout by temporarily
swapping sys.modules/sys.path so both registries coexist in one process.
The old worktree needs a spark-warehouse symlink if any query reads
prebuilt artifacts (dupgraph, ANN indexes).
"""

from __future__ import annotations

import argparse
import gc
import importlib
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PKG = "structured_streaming_cassandra_sink_spark"

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _load_registry(repo_path: str) -> dict:
    """Import the package rooted at repo_path and return its QUERIES map.

    Temporarily evicts any already-imported package modules so the import
    machinery resolves everything (including the package's absolute
    self-imports) against repo_path, then restores the previous modules.
    The returned callables keep references to their own module objects, so
    both versions stay usable side by side."""
    saved = {
        k: v
        for k, v in sys.modules.items()
        if k == PKG or k.startswith(PKG + ".")
    }
    for k in saved:
        del sys.modules[k]
    sys.path.insert(0, repo_path)
    try:
        reg = importlib.import_module(PKG + ".plans.registry")
        reg.load_all()
        queries = dict(reg.QUERIES)
    finally:
        sys.path.remove(repo_path)
        for k in [k for k in sys.modules if k == PKG or k.startswith(PKG + ".")]:
            del sys.modules[k]
        sys.modules.update(saved)
    return queries


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--old", required=True, help="path to old-version worktree")
    ap.add_argument("--samples", type=int, default=5)
    ap.add_argument("--out", default=None, help="write JSON results here too")
    args = ap.parse_args()

    old_q = _load_registry(args.old)
    new_q = _load_registry(REPO)
    for n in args.names:
        if n not in old_q or n not in new_q:
            print(f"unknown query (old={n in old_q} new={n in new_q}): {n}",
                  file=sys.stderr)
            return 2

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ab-interleaved")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/nation.parquet").count()

    def timed(fn) -> float:
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        del df
        gc.collect()
        spark._jvm.System.gc()
        if dt > 2.0:
            time.sleep(min(2.0, dt / 2))
        return dt

    results: dict[str, dict] = {}
    samples: dict[tuple[str, str], list[float]] = {}
    for name in args.names:
        samples[(name, "old")] = []
        samples[(name, "new")] = []
        # untimed warm-up of BOTH shapes (JIT/codegen/IO cache)
        spark.sparkContext.setJobDescription(f"warmup old {name}")
        timed(old_q[name])
        spark.sparkContext.setJobDescription(f"warmup new {name}")
        timed(new_q[name])

    for p in range(args.samples):
        order = ["old", "new"] if p % 2 == 0 else ["new", "old"]
        for name in args.names:
            for variant in order:
                fn = old_q[name] if variant == "old" else new_q[name]
                spark.sparkContext.setJobDescription(f"{variant} {name} pass{p}")
                samples[(name, variant)].append(timed(fn))

    for name in args.names:
        o, n = samples[(name, "old")], samples[(name, "new")]
        results[name] = {
            "old": [round(x, 3) for x in o],
            "new": [round(x, 3) for x in n],
            "old_min": round(min(o), 3),
            "new_min": round(min(n), 3),
            "old_median": round(statistics.median(o), 3),
            "new_median": round(statistics.median(n), 3),
            "speedup_min": round(min(o) / min(n), 3),
            "speedup_median": round(
                statistics.median(o) / statistics.median(n), 3
            ),
        }
        print(json.dumps({"query": name, **results[name]}))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
