"""Spark-vs-DuckDB oracle timing ratios at the bench scale.

For every query in the bench roster that has a DuckDB oracle, time the
oracle SQL in-process (min of N) on the sf0.1 parquet and compare to
the Spark min recorded in BENCH_local.json. Prints one JSON line per
query plus a summary, mirroring the round-8 "Absolute baseline"
methodology in BASELINE.md (substantial = Spark min >= 1.5 s, where
the 2-aggregation Spark job floor stops dominating the ratio).

Usage: python tools/oracle_ratio.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    iters = max(int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "2")), 1)
    with open(os.path.join(REPO, "BENCH_local.json")) as f:
        bench = json.load(f)["queries"]
    import __spark_entry__ as entry

    osql = entry.oracle_sql()
    names = [n for n in bench if n in osql and not n.startswith("_")]
    only = os.environ.get("SPARK_GRAFT_RATIO_QUERIES")
    if only:
        names = [n for n in names if n in set(only.split(","))]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    rows = []
    for name in names:
        samples = []
        try:
            for _ in range(iters):
                t0 = time.monotonic()
                con.execute(osql[name]).fetchall()
                samples.append(time.monotonic() - t0)
        except Exception as exc:
            print(json.dumps({"name": name, "err": str(exc)[:120]}))
            continue
        duck_raw = min(samples)
        duck = round(duck_raw, 3)
        spark = bench[name]
        # Ratio from the UNROUNDED minimum: a sub-millisecond oracle
        # rounds to 0.0, and a None ratio on a substantial row would
        # crash the median below.
        ratio = round(spark / duck_raw, 2) if duck_raw > 0 else None
        rows.append({"name": name, "duck_s": duck, "spark_s": spark,
                     "ratio": ratio})
        print(json.dumps(rows[-1]), flush=True)
    subs = [r for r in rows if r["spark_s"] >= 1.5 and r["ratio"] is not None]
    wins = [r for r in rows if r["ratio"] is not None and r["ratio"] < 1.0]
    print(json.dumps({
        "n": len(rows),
        "substantial_n": len(subs),
        "substantial_median_ratio": round(
            statistics.median(r["ratio"] for r in subs), 2) if subs else None,
        "spark_wins": sorted(
            (r["name"] for r in wins), key=lambda n: next(
                r["ratio"] for r in wins if r["name"] == n)),
    }))


if __name__ == "__main__":
    main()
