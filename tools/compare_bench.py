"""Calib-adjusted cross-round bench comparison.

Host speed differs per round (BENCH_r05 ran at calib 0.95, a mid-round-6
window at 1.25 — same machine class), so raw per-query seconds across
rounds are not comparable; ``calib_s`` (bench.py's single-core yardstick)
normalizes them. This tool parses the LAST line of a prior round's
BENCH_r{N}.json 2000-char stdout tail, pairs it with the current
BENCH_local.json, and prints common-set totals plus the worst/best
per-query calib-adjusted ratios — the first thing to read before calling
any per-query time a regression (round-6 lesson: three same-code runs
measured 0.80x, 0.88x and 1.03x on the same diff; the spread IS host
noise).

Usage: python tools/compare_bench.py [BENCH_rNN.json] [BENCH_local.json]
"""

from __future__ import annotations

import json
import os
import sys


def load_round(path: str) -> dict:
    d = json.load(open(path))
    if "tail" in d:  # driver snapshot: bench line is the last tail line
        return json.loads(d["tail"].splitlines()[-1])
    return d


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prev_path = sys.argv[1] if len(sys.argv) > 1 else None
    if prev_path is None:  # newest BENCH_r*.json in the repo root
        cands = sorted(
            f for f in os.listdir(here)
            if f.startswith("BENCH_r") and f.endswith(".json")
        )
        if not cands:
            sys.exit("no BENCH_r*.json found; pass a path")
        prev_path = os.path.join(here, cands[-1])
    cur_path = (
        sys.argv[2] if len(sys.argv) > 2 else os.path.join(here, "BENCH_local.json")
    )
    prev, cur = load_round(prev_path), load_round(cur_path)
    cp, cc = prev["calib_s"], cur["calib_s"]
    qp, qc = prev["queries"], cur["queries"]
    common = [
        k for k in qp
        if k in qc and not k.startswith("_") and qp[k] > 0 and qc[k] > 0
    ]
    tp = sum(qp[k] for k in common)
    tc = sum(qc[k] for k in common)
    print(f"prev {os.path.basename(prev_path)} calib={cp}  "
          f"cur {os.path.basename(cur_path)} calib={cc}")
    print(f"common {len(common)} queries: prev {tp:.1f}s  cur {tc:.1f}s  "
          f"raw {tc / tp:.2f}x  calib-adj {(tc / cc) / (tp / cp):.2f}x")

    def adj(k: str) -> float:
        return (qc[k] / cc) / (qp[k] / cp)

    rows = sorted(common, key=adj, reverse=True)
    print("\nworst calib-adjusted ratios:")
    for k in rows[:10]:
        print(f"  {k:30s} prev {qp[k]:6.2f}  cur {qc[k]:6.2f}  adj {adj(k):.2f}x")
    print("best:")
    for k in rows[-6:]:
        print(f"  {k:30s} prev {qp[k]:6.2f}  cur {qc[k]:6.2f}  adj {adj(k):.2f}x")
    only_cur = sorted(
        (k for k in qc if k not in qp and not k.startswith("_")),
        key=lambda k: -qc[k],
    )
    if only_cur:
        print("\nnew queries (no prior number): "
              + ", ".join(f"{k}={qc[k]}" for k in only_cur))


if __name__ == "__main__":
    main()
