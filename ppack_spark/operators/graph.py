"""Link-graph operators: fixed-iteration PageRank and degree reports.

A web-scale corpus build ranks its crawl frontier and weights its
host mix by LINK AUTHORITY, not just document counts — a host cited
by many other hosts outranks a crawler trap with a million self-made
pages. These operators take an edge list (host→host, url→url,
doc→doc — anything with src/dst columns) and compute:

* :func:`pagerank` — PageRank (Page, Brin, Motwani & Winograd 1999)
  run for a FIXED number of power iterations from the uniform
  vector, with the standard damping-factor teleport and dangling-mass
  redistribution. Fixed iterations (not convergence-tested) keep the
  operator deterministic and engine-replayable: each iteration's
  ranks are rounded to ``round_digits``, collapsing summation-order
  last-ulp noise exactly like the IVF trainer's rounded Lloyd means
  (operators/ann.py:ivf_index_fixed), so a SQL oracle walks the
  identical trajectory.
* :func:`degree_report` — in/out degree and distinct-neighbor counts
  per node, the cheap pre-flight before trusting PageRank output
  (a node with out-degree 10^6 is an extraction bug signal).

Scale shape: per iteration, PageRank is one equi-join of the rank
vector with the normalized edge list plus one groupBy(dst) — both
shuffle on node keys only (ranks are (node, double) pairs; the edge
list is re-used with its share precomputed once). The rank frame is
lineage-cut between iterations (operators/util.py:cut_lineage — the
E112 iterative-loop contract) so the plan does not grow with
``iters``. Nothing collects to the driver.

Reference parity: the reference engine (nerskin/ppack) has no graph
surface; this extends the SURVEY.md §2e pipeline families with the
crawl-authority operators a 100 TB web-corpus build needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .util import cut_lineage


def _edge_weights(
    edges: DataFrame, src: str, dst: str, weight: str | None
) -> DataFrame:
    """Collapse parallel edges to (src, dst, w): multiplicity counts
    (or weight sums) — one groupBy on the edge key."""
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    return (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .groupBy(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
        .agg(F.sum(w).alias("__w"))
        .filter(F.col("__w") > 0)
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: float = 0.85,
    iters: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list.

    Nodes are the union of sources and destinations; parallel edges
    act as weights (or pass ``weight``). Each iteration computes

        r'(v) = (1-d)/N + d · (Σ_{u→v} r(u)·w(u,v)/out(u) + D/N)

    where D is the total rank mass sitting on dangling nodes (no
    out-edges) — redistributed uniformly, the standard convention, so
    Σr stays 1 every iteration. Ranks are rounded to ``round_digits``
    per iteration (see module docstring — cross-engine determinism).

    Returns ``(node, pagerank, rank)`` with rank the dense ordering
    by descending pagerank (node tie-break). Empty edge input returns
    an empty, well-formed frame.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"pagerank: damping must be in (0, 1), got {damping}")
    if iters < 1:
        raise ValueError(f"pagerank: need iters >= 1, got {iters}")
    from pyspark.sql import Window

    ew = _edge_weights(edges, src, dst, weight)
    nodes = (
        ew.select(F.col("__src").alias("node"))
        .unionByName(ew.select(F.col("__dst").alias("node")))
        .distinct()
    )
    outw = ew.groupBy("__src").agg(F.sum("__w").alias("__outw"))
    # Per-edge share of its source's rank — computed once, reused by
    # every iteration (the division happens edge-side so the join in
    # the loop is rank ⋈ shares, nothing else).
    shares = ew.join(outw, "__src").select(
        "__src", "__dst", (F.col("__w") / F.col("__outw")).alias("__share")
    )
    # N rides along as a column: no driver-side count, the same 1-row
    # broadcast pattern as corpus_mix_report.
    ncnt = nodes.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    ranks = nodes.crossJoin(F.broadcast(ncnt)).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("pr"), "__n"
    )
    has_out = outw.select(F.col("__src").alias("node"))
    for _ in range(iters):
        dang = (
            ranks.join(has_out, "node", "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("__dang"))
        )
        inflow = (
            ranks.join(shares, ranks["node"] == shares["__src"])
            .groupBy(F.col("__dst").alias("node"))
            .agg(F.sum(F.col("pr") * F.col("__share")).alias("__in"))
        )
        ranks = cut_lineage(
            ranks.join(inflow, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                F.round(
                    (F.lit(1.0) - damping) / F.col("__n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__in"), F.lit(0.0))
                        + F.col("__dang") / F.col("__n")
                    ),
                    round_digits,
                ).alias("pr"),
                "__n",
            )
        )
    w = Window.orderBy(F.desc("pr"), F.asc("node"))
    return ranks.select(
        "node",
        F.col("pr").alias("pagerank"),
        F.row_number().over(w).cast("long").alias("rank"),
    )


def degree_report(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node degree census over an edge list: total out/in edge
    counts (parallel edges counted) and distinct out/in neighbor
    counts. Returns ``(node, out_edges, in_edges, out_neighbors,
    in_neighbors, rank)`` ranked by descending in_edges (node
    tie-break) — the "who gets linked to" pre-flight. Two node-keyed
    aggregations + one outer merge; shuffles node keys only."""
    from pyspark.sql import Window

    e = edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
    out_d = e.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_edges"),
        F.countDistinct(F.col(dst)).alias("out_neighbors"),
    )
    in_d = e.groupBy(F.col(dst).alias("node")).agg(
        F.count(F.lit(1)).alias("in_edges"),
        F.countDistinct(F.col(src)).alias("in_neighbors"),
    )
    merged = out_d.join(in_d, "node", "full_outer").select(
        "node",
        F.coalesce("out_edges", F.lit(0)).cast("long").alias("out_edges"),
        F.coalesce("in_edges", F.lit(0)).cast("long").alias("in_edges"),
        F.coalesce("out_neighbors", F.lit(0)).cast("long").alias("out_neighbors"),
        F.coalesce("in_neighbors", F.lit(0)).cast("long").alias("in_neighbors"),
    )
    w = Window.orderBy(F.desc("in_edges"), F.asc("node"))
    return merged.withColumn("rank", F.row_number().over(w).cast("long"))
