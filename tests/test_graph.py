"""Link-graph operators (operators/graph.py): fixed-iteration
PageRank and the degree census. The registry gates hash-check the
derived-graph chains against DuckDB; these tests pin the graph-theory
properties on hand-built graphs: mass conservation, symmetry, the
dangling-node convention, weighted edges, and hardening."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ppack_spark.operators.graph import degree_report, pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_mass_conserved(spark):
    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")],
    )
    pr = pagerank(e, iters=3)
    total = pr.agg(F.sum("pagerank")).collect()[0][0]
    # rounding to 6 per node per iteration bounds drift at ~n*5e-7
    assert abs(total - 1.0) < 1e-4


def test_pagerank_symmetric_cycle_is_uniform(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    rows = pagerank(e, iters=5).collect()
    vals = {r["pagerank"] for r in rows}
    assert len(vals) == 1
    assert abs(next(iter(vals)) - 1 / 3) < 1e-6


def test_pagerank_authority_ordering(spark):
    """Everyone links to 'hub'; hub links to one spoke. The hub must
    outrank every spoke, and the linked spoke outranks the others.
    The hub↔s1 2-cycle makes finite power iteration oscillate with
    period 2 (even counts transiently favor the spoke), so assert at
    an odd count where the decayed amplitude keeps hub on top."""
    e = _edges(
        spark,
        [("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("hub", "s1")],
    )
    got = {r["node"]: r for r in pagerank(e, iters=11).collect()}
    assert got["hub"]["rank"] == 1
    assert got["s1"]["pagerank"] > got["s2"]["pagerank"]
    assert got["s2"]["pagerank"] == got["s3"]["pagerank"]


def test_pagerank_dangling_mass_redistributed(spark):
    """'sink' has no out-edges: its rank mass must recirculate (total
    stays 1) instead of leaking."""
    e = _edges(spark, [("a", "sink"), ("b", "sink"), ("a", "b")])
    pr = pagerank(e, iters=8)
    total = pr.agg(F.sum("pagerank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-4
    got = {r["node"]: r["pagerank"] for r in pr.collect()}
    assert got["sink"] > got["a"]


def test_pagerank_weights_and_parallel_edges_agree(spark):
    """One weight-2 edge == the same edge twice."""
    dup = pagerank(
        _edges(spark, [("a", "b"), ("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")]),
        iters=4,
    )
    w = spark.createDataFrame(
        [("a", "b", 2.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    weighted = pagerank(w, weight="w", iters=4)
    assert {tuple(r) for r in dup.collect()} == {
        tuple(r) for r in weighted.collect()
    }


def test_pagerank_empty_and_validation(spark):
    empty = spark.createDataFrame([], "src string, dst string")
    out = pagerank(empty)
    assert out.count() == 0
    assert out.columns == ["node", "pagerank", "rank"]
    e = _edges(spark, [("a", "b")])
    with pytest.raises(ValueError, match="damping"):
        pagerank(e, damping=1.0)
    with pytest.raises(ValueError, match="iters"):
        pagerank(e, iters=0)


def test_pagerank_null_endpoints_dropped(spark):
    e = spark.createDataFrame(
        [("a", "b"), (None, "b"), ("a", None), ("b", "a")],
        "src string, dst string",
    )
    nodes = {r["node"] for r in pagerank(e, iters=2).collect()}
    assert nodes == {"a", "b"}


def test_degree_report(spark):
    e = _edges(
        spark,
        [("a", "b"), ("a", "b"), ("a", "c"), ("c", "b"), ("b", "a")],
    )
    got = {r["node"]: r for r in degree_report(e).collect()}
    b = got["b"]
    assert (b["in_edges"], b["in_neighbors"], b["out_edges"]) == (3, 2, 1)
    a = got["a"]
    assert (a["out_edges"], a["out_neighbors"], a["in_edges"]) == (3, 2, 1)
    assert b["rank"] == 1  # most linked-to
    # source-only / sink-only nodes still appear with zero fills
    c = got["c"]
    assert (c["in_edges"], c["out_edges"]) == (1, 1)


def test_degree_report_empty(spark):
    empty = spark.createDataFrame([], "src string, dst string")
    out = degree_report(empty)
    assert out.count() == 0
    assert "in_neighbors" in out.columns
