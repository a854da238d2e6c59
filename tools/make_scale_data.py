"""Build larger scale factors by replicating the driver's sf0.1 tables.

The driver ships sf{0.001,0.01,0.1} only; the 100 TB brief needs
evidence that the headline chains scale, so this tool manufactures
sfX = replicas x sf0.1 under the REPO (never touching /root/testdata):

    python tools/make_scale_data.py --replicas 10 --out testdata_sf1

Replication is SELF-SIMILAR, not byte-copy — the point is that the
sfX workload looks statistically like sf0.1, only bigger, so measured
sf0.1 -> sfX scaling exponents mean something:

* every table's keys shift by a per-replica offset (foreign keys
  consistently with their parents), so joins keep their per-key
  fan-out instead of growing hot keys;
* generated name columns are re-derived from the shifted key
  (Customer#..., Supplier#...), keeping name-comparator workloads
  honest;
* document/part word-salad text is deterministically re-permuted per
  (replica, id) — same vocabulary, length, and language statistics,
  but fresh shingle sets, so dedup finds the same RATE of chance
  near-dups instead of 10 planted copies of every document (which
  would measure a duplicate-explosion stress test, not scaling);
* embeddings get a small deterministic per-replica perturbation so
  ANN indexes see 10x distinct vectors, not 10 copies of each.

Replica 0 is the original data verbatim; dims (region, nation) are
never replicated.
"""

from __future__ import annotations

import argparse
import os
import random

import duckdb

# per-replica key offsets, comfortably above any sf0.1 key range but
# small enough that re-derived 9-digit names stay well-formed
OFF = {
    "custkey": 1_000_000,
    "orderkey": 10_000_000,
    "partkey": 1_000_000,
    "suppkey": 100_000,
    "doc": 1_000_000,
    "vec": 1_000_000,
    "event": 100_000_000,
    "user": 1_000_000,
}


def _shuffle_words(text: str, seed: int) -> str:
    words = text.split()
    random.Random(seed).shuffle(words)
    return " ".join(words)


def build(src: str, out: str, replicas: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"set threads to {os.cpu_count()}")

    def t(name: str) -> str:
        return f"read_parquet('{src}/{name}.parquet')"

    def write(name: str, sql: str) -> None:
        con.execute(
            f"copy ({sql}) to '{out}/{name}.parquet' (format parquet)"
        )
        n = con.execute(f"select count(*) from '{out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    # dims copy through
    for name in ("region", "nation"):
        write(name, f"select * from {t(name)}")

    reps = ", ".join(str(i) for i in range(replicas))
    rep = f"(select unnest([{reps}]) as r)"

    write(
        "customer",
        f"""
        select c_custkey + r * {OFF['custkey']} as c_custkey,
               'Customer#' || lpad(cast(c_custkey + r * {OFF['custkey']} as varchar), 9, '0') as c_name,
               c_nationkey, c_acctbal, c_mktsegment
        from {t('customer')}, {rep}
        """,
    )
    write(
        "supplier",
        f"""
        select s_suppkey + r * {OFF['suppkey']} as s_suppkey,
               'Supplier#' || lpad(cast(s_suppkey + r * {OFF['suppkey']} as varchar), 9, '0') as s_name,
               s_nationkey, s_acctbal
        from {t('supplier')}, {rep}
        """,
    )
    write(
        "orders",
        f"""
        select o_orderkey + r * {OFF['orderkey']} as o_orderkey,
               o_custkey + r * {OFF['custkey']} as o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        from {t('orders')}, {rep}
        """,
    )
    write(
        "lineitem",
        f"""
        select l_orderkey + r * {OFF['orderkey']} as l_orderkey,
               l_partkey + r * {OFF['partkey']} as l_partkey,
               l_suppkey + r * {OFF['suppkey']} as l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        from {t('lineitem')}, {rep}
        """,
    )
    write(
        "events",
        f"""
        select event_id + r * {OFF['event']} as event_id, ts,
               user_id + r * {OFF['user']} as user_id,
               event_type, value, props
        from {t('events')}, {rep}
        """,
    )

    # part / documents: python-side word re-permutation per replica
    part = con.execute(f"select * from {t('part')}").df()
    frames = []
    for i in range(replicas):
        p = part.copy()
        p["p_partkey"] = p["p_partkey"] + i * OFF["partkey"]
        if i:
            p["p_name"] = [
                _shuffle_words(s, i * 131 + int(k))
                for s, k in zip(part["p_name"], part["p_partkey"])
            ]
        frames.append(p)
    import pandas as pd

    part_all = pd.concat(frames, ignore_index=True)
    con.register("part_all", part_all)
    write("part", "select * from part_all")

    docs = con.execute(f"select * from {t('documents')}").df()
    frames = []
    for i in range(replicas):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + i * OFF["doc"]
        if i:
            d["text"] = [
                _shuffle_words(s, i * 9176 + int(k)) if isinstance(s, str) else s
                for s, k in zip(docs["text"], docs["doc_id"])
            ]
            d["n_chars"] = [
                len(s) if isinstance(s, str) else n
                for s, n in zip(d["text"], docs["n_chars"])
            ]
        frames.append(d)
    docs_all = pd.concat(frames, ignore_index=True)
    con.register("docs_all", docs_all)
    write("documents", "select * from docs_all")

    write(
        "embeddings",
        f"""
        select vec_id + r * {OFF['vec']} as vec_id,
               case when r = 0 then embedding
                    else list_transform(
                        embedding,
                        (x, j) -> cast(x + 0.001 * r * (((vec_id + j) % 7) - 3) as float)
                    ) end as embedding,
               label
        from {t('embeddings')}, {rep}
        """,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--replicas", type=int, required=True)
    args = ap.parse_args()
    build(args.src, args.out, args.replicas)


if __name__ == "__main__":
    main()
