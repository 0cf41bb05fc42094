"""Local correctness harness — mimics the driver's DuckDB-oracle compare.

Usage:
    python tools/check.py [query ...]          # default: all, sf0.01
    SF_DIR=/root/testdata/sf0.001 python tools/check.py

For each registered query: run the Spark plan and the DuckDB oracle on the
same parquet dir, compare row count, column names (sorted), and
order-insensitive values (floats to 9 significant digits). Queries without
an oracle get a rows-only report.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from structured_streaming_cassandra_sink_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return 0.0
        return float(f"{v:.9g}")
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _rows_to_set(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(_norm(r[i]) for i in order))
    return sorted(out, key=repr)


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    wanted = sys.argv[1:]
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = wanted or sorted(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}; known: {sorted(qs)}")
        return 2

    spark = get_spark(app_name="check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows, cols={scols} ({time.time()-t0:.1f}s) [rows-only]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {type(e).__name__}: {e}")
            failures += 1
            continue
        ok = True
        msgs = []
        if len(srows) != len(orows):
            ok = False
            msgs.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            ok = False
            msgs.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if ok:
            sset = _rows_to_set([tuple(r) for r in srows], scols)
            oset = _rows_to_set(orows, ocols)
            if sset != oset:
                ok = False
                diff_s = [r for r in sset if r not in set(oset)][:3]
                diff_o = [r for r in oset if r not in set(sset)][:3]
                msgs.append(f"values differ; spark-only={diff_s} oracle-only={diff_o}")
        status = "ok   " if ok else "FAIL "
        if not ok:
            failures += 1
        print(f"{status} {name}: {len(srows)} rows ({time.time()-t0:.1f}s) {'; '.join(msgs)}")
    print(f"\n{len(names)} queries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
