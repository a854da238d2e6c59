"""TSV → partitioned parquet → glob rescan ETL (reference
scratch.R:142-156): layout, losslessness, and partition pruning."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ppack_spark.sources.etl import read_parquet_glob, tsv_to_partitioned_parquet

from conftest import SF_DIR


COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
SCHEMA = (
    "c_custkey bigint, c_name string, c_nationkey bigint, "
    "c_acctbal double, c_mktsegment string"
)


@pytest.fixture(scope="module")
def etl_dirs(spark, tables, tmp_path_factory):
    base = tmp_path_factory.mktemp("etl")
    tsv_dir = str(base / "tsv")
    pq_dir = str(base / "parquet")
    tables["customer"].select(*COLS).write.mode("overwrite").option("sep", "\t").option(
        "header", "true"
    ).csv(tsv_dir)
    tsv_to_partitioned_parquet(
        spark, tsv_dir, pq_dir, columns=COLS, partition_by="c_mktsegment", schema=SCHEMA
    )
    return tsv_dir, pq_dir


def test_hive_partition_layout(etl_dirs):
    _, pq_dir = etl_dirs
    parts = [d for d in os.listdir(pq_dir) if d.startswith("c_mktsegment=")]
    assert len(parts) >= 2, f"expected hive-partitioned dirs, got {os.listdir(pq_dir)}"


def test_roundtrip_lossless(spark, tables, etl_dirs):
    _, pq_dir = etl_dirs
    out = read_parquet_glob(spark, pq_dir + "/*/*.parquet")
    src = tables["customer"]
    assert out.count() == src.count()
    got = sorted(
        out.select(*COLS).collect(),
        key=lambda r: r["c_custkey"],
    )
    want = sorted(src.select(*COLS).collect(), key=lambda r: r["c_custkey"])
    for g, w in zip(got, want):
        assert g["c_name"] == w["c_name"]
        assert g["c_acctbal"] == pytest.approx(w["c_acctbal"])
        assert g["c_mktsegment"] == w["c_mktsegment"]


def test_partition_pruning_reaches_scan(spark, etl_dirs):
    """A filter on the partition column must become a PartitionFilter
    (pruned directory listing), not a post-scan filter."""
    _, pq_dir = etl_dirs
    df = read_parquet_glob(spark, pq_dir + "/*/*.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "c_mktsegment" in plan.split("PartitionFilters")[1].split("]")[0]


def test_default_driver_memory_derivation():
    """The local-heap default must adapt to the host: a g-suffixed
    integer, capped at 48g, floored at 2g (a fixed 48g -Xmx fails JVM
    startup on small hosts)."""
    import re

    from ppack_spark.session import _default_driver_memory

    mem = _default_driver_memory()
    m = re.fullmatch(r"(\d+)g", mem)
    assert m, mem
    assert 2 <= int(m.group(1)) <= 48


def test_bucketed_tables_join_without_exchange(spark, tables, tmp_path):
    """Two tables bucketed by the join key with equal bucket counts
    must SortMergeJoin with NO Exchange on either side — the write-once
    shuffle amortized across every later join. Values must match the
    plain join."""
    from pyspark.sql import functions as F

    from ppack_spark.sources.etl import write_bucketed

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cb = write_bucketed(
            tables["customer"], "t_cust_bucketed", "c_custkey",
            num_buckets=8, path=str(tmp_path / "cust"),
        )
        ob = write_bucketed(
            tables["orders"], "t_ord_bucketed", "o_custkey",
            num_buckets=8, path=str(tmp_path / "ord"),
        )
        j = cb.join(ob, cb["c_custkey"] == ob["o_custkey"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        want = (
            tables["customer"]
            .join(tables["orders"],
                  tables["customer"]["c_custkey"] == tables["orders"]["o_custkey"])
            .count()
        )
        assert j.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("drop table if exists t_cust_bucketed")
        spark.sql("drop table if exists t_ord_bucketed")


def test_jsonl_roundtrip_preserves_newlines_and_unicode(spark, tmp_path):
    """JSON escaping must keep the line=record invariant even when the
    text itself contains newlines, tabs, quotes, and multi-byte
    UTF-8 — and the explicit-schema rescan must be lossless."""
    from ppack_spark.sources.etl import read_jsonl, write_jsonl

    rows = [
        (1, 'line one\nline two\ttabbed "quoted"'),
        (2, "déjà vu — 中文 text ✓"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "jsonl")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    want = dict((i, t) for i, t in rows)
    # Spark's JSON writer drops null fields; the schema'd reader
    # restores them as NULL
    assert got == want
    assert back.schema == df.schema


def test_write_sharded_bounds_file_size(spark, tmp_path):
    """No output file exceeds max_records_per_file, and the shards
    re-read losslessly."""
    import glob

    from ppack_spark.sources.etl import write_sharded

    df = spark.range(1000).withColumnRenamed("id", "doc_id").repartition(2)
    path = str(tmp_path / "shards")
    write_sharded(df, path, max_records_per_file=100)
    files = glob.glob(path + "/*.parquet")
    assert len(files) >= 10
    for f in files:
        assert spark.read.parquet(f).count() <= 100
    assert spark.read.parquet(path).count() == 1000


def test_write_sharded_partitioned_by_split(spark, tmp_path):
    """partition_by produces hive-style split directories whose
    re-read round-trips every row with pruned per-split scans."""
    import glob

    from pyspark.sql import functions as F

    from ppack_spark.sources.etl import write_sharded

    df = (
        spark.range(300)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "split",
            F.when(F.col("doc_id") % 10 < 8, "train").otherwise("val"),
        )
    )
    path = str(tmp_path / "bysplit")
    write_sharded(df, path, max_records_per_file=50, partition_by=["split"])
    assert glob.glob(path + "/split=train/*.parquet")
    assert glob.glob(path + "/split=val/*.parquet")
    back = spark.read.parquet(path)
    assert back.count() == 300
    assert back.filter(F.col("split") == "val").count() == 60


def test_zorder_write_tightens_file_bounding_boxes(spark, tables, tmp_path):
    """Z-ordered parquet must give per-file min-max bounding boxes that
    are tight in BOTH dimensions — the property file skipping relies
    on. A 1-D sort on user_id alone leaves each file spanning the full
    day range; the Morton layout's mean box area must be well under
    both that and the unsorted layout's."""
    import pyarrow.dataset as ds

    from ppack_spark.sources.etl import write_zordered

    from ppack_spark.plans.registry_data import _epoch_s

    e = tables["events"].select(
        "event_id",
        F.col("user_id").cast("long").alias("user_id"),
        F.floor(_epoch_s(F.col("ts")) / 86400).cast("long").alias("day"),
    )

    zpath = str(tmp_path / "zorder")
    back = write_zordered(e, zpath, ["user_id", "day"], bits=10, n_files=16)
    assert back.count() == e.count()  # lossless

    lpath = str(tmp_path / "linear")
    (
        e.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    lo = e.agg(F.min("user_id"), F.max("user_id"), F.min("day"), F.max("day"))
    mnu, mxu, mnd, mxd = lo.collect()[0]
    u_span, d_span = mxu - mnu + 1, mxd - mnd + 1

    def mean_extents(path: str) -> tuple[float, float]:
        """Per-file min-max extent in each dimension, as a fraction of
        that dimension's full range — the quantity a range filter's
        pruning probability depends on (NOT box area: a 1-D sort wins
        on area while being unprunable in the other dimension)."""
        u_fr, d_fr = [], []
        for frag in ds.dataset(path, format="parquet").get_fragments():
            u_lo = u_hi = d_lo = d_hi = None
            for rg in frag.row_groups:
                s = rg.statistics
                if not s:
                    continue
                u = s.get("user_id")
                d = s.get("day")
                u_lo = u["min"] if u_lo is None else min(u_lo, u["min"])
                u_hi = u["max"] if u_hi is None else max(u_hi, u["max"])
                d_lo = d["min"] if d_lo is None else min(d_lo, d["min"])
                d_hi = d["max"] if d_hi is None else max(d_hi, d["max"])
            u_fr.append((u_hi - u_lo + 1) / u_span)
            d_fr.append((d_hi - d_lo + 1) / d_span)
        assert len(u_fr) > 4  # multiple files, or the test says nothing
        return sum(u_fr) / len(u_fr), sum(d_fr) / len(d_fr)

    z_u, z_d = mean_extents(zpath)
    l_u, l_d = mean_extents(lpath)
    # 1-D user sort: tight on user_id but every file spans ~all days —
    # a day filter prunes nothing. Z-order: bounded extent in BOTH.
    assert l_d > 0.9, f"fixture degenerate? linear day extent {l_d:.3f}"
    assert z_u < 0.5, f"z-order user extent too loose: {z_u:.3f}"
    assert z_d < 0.5, f"z-order day extent too loose: {z_d:.3f}"
    assert z_d < l_d * 0.6, f"no day-pruning win: {z_d:.3f} vs {l_d:.3f}"


def test_zorder_key_validation(spark, tables):
    from ppack_spark.sources.etl import zorder_key

    with pytest.raises(ValueError):
        zorder_key(["a"], [])
    with pytest.raises(ValueError):
        zorder_key(["a", "b"], [(0, 10), (0, 10)], bits=32)
    with pytest.raises(ValueError):
        zorder_key(["a"], [(5, 4)])


def test_write_zordered_empty_input_passthrough(spark, tmp_path):
    """Zero rows (or no bounds) must write an empty-but-valid layout
    instead of dying inside the key builder."""
    from ppack_spark.sources.etl import write_zordered

    df = spark.createDataFrame([], "a long, b long")
    out = write_zordered(df, str(tmp_path / "z"), ["a", "b"])
    assert out.count() == 0 and out.columns == ["a", "b"]
