"""Cluster resolution: connected components over candidate-pair edges.

The reference stops at scored pairs and consumes ground-truth
``cluster`` ids for evaluation only (scratch.R:131-133) — it never
builds clusters itself. Resolving accepted pairs into entity clusters
(every record in a component is the same entity) is the standard final
step of a linkage/dedup pipeline (splink's ``cluster_pairwise_
predictions_at_threshold``), so the engine provides it.

Algorithm: iterative min-label propagation over the undirected edge
set — each node repeatedly adopts the smallest component id among
itself and its neighbours until a fixpoint. Convergence is
O(component diameter) joins; every iteration is a shuffle on the node
id and the lineage is cut with ``localCheckpoint`` so plans don't grow
unboundedly. Linkage/dedup components are near-cliques (diameter 2-3
in practice), so the loop terminates in a handful of rounds; for
adversarial long-chain graphs the alternating large-star/small-star
variant (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC 2014) converges in O(log n) rounds with the same
join-shape — the per-iteration plan here is deliberately identical so
it can be swapped in without changing callers.

Oracle: a DuckDB recursive CTE computes the reachability closure and
takes min(reachable) per node — exponentially worse than the Spark
plan but exact on fixture-sized inputs (plans/registry_data.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "attach_cluster_ids"]


def connected_components(
    edges: DataFrame,
    id_left: str = "id_left",
    id_right: str = "id_right",
    max_iter: int = 30,
) -> DataFrame:
    """Resolve undirected edges into components.

    Returns ``(node, component)`` where ``component`` is the smallest
    node id in the node's connected component. Only nodes appearing in
    at least one edge are returned (singletons are their own component
    by definition and need no resolution).
    """
    e = edges.select(
        F.col(id_left).alias("src"), F.col(id_right).alias("dst")
    )
    # symmetrize once; propagation then only needs one direction
    e = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    e = e.localCheckpoint()

    labels = e.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )
    changed = -1
    for _ in range(max_iter):
        nbr = (
            e.join(labels, e["dst"] == labels["node"])
            .select(e["src"].alias("node"), F.col("component"))
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        new_labels = new_labels.localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.component") < F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # Silent partial propagation would hand out WRONG (split)
        # component ids for any component with diameter > max_iter.
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            f"iterations ({changed} labels still changing); raise max_iter "
            "(diameter-bound) or switch to the large-star/small-star variant"
        )
    return labels


def attach_cluster_ids(
    records: DataFrame,
    components: DataFrame,
    unique_id: str,
) -> DataFrame:
    """Join resolved component ids back to the record table; records
    with no accepted pair keep their own id as a singleton cluster."""
    comp = components.select(
        F.col("node").alias(unique_id), F.col("component").alias("cluster_id")
    )
    return records.join(comp, on=unique_id, how="left").withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col(unique_id))
    )
