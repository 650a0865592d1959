"""Distributed connected components over a similarity-pair graph.

The missing last step of every dedup pipeline: pair generators
(``pipeline.dedup``) emit EDGES (doc_a ~ doc_b), but "keep one copy
per duplicate *cluster*" needs the transitive closure — A~B, B~C must
collapse A, B, C together even though (A, C) was never emitted.

Algorithm: iterative min-label propagation expressed as DataFrame
joins — each round every node adopts the smallest component label in
its closed neighborhood. Converges in O(graph diameter) rounds;
near-duplicate clusters are dense (diameter 2–3 in practice), so 3–5
rounds close real corpora. Each round is one keyed shuffle
(neighbor-min aggregation) plus one join back to the label table;
per-round state is ``localCheckpoint``-ed so the loop's lineage (and
therefore task-retry cost) stays O(1) instead of O(rounds). The
driver sees only a convergence counter per round (bounded metadata —
no row data is collected).

For adversarially long chains (diameter ≫ 10) the literature's
alternating large-star/small-star rewiring [Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — public] converges in
O(log²) rounds with the same join-shaped building blocks; plain
min-propagation is the right default for dedup graphs where clusters
are near-cliques.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mini_sql_engine_spark.plans import materialized


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``, where
    component = the minimum node id reachable through the undirected
    pair graph. Deterministic: labels depend only on the edge set.

    Raises ``RuntimeError`` if the graph has not converged after
    ``max_rounds`` (diameter > max_rounds) rather than returning a
    silently-wrong partial labeling.
    """
    edges = pairs.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).filter(F.col("u") != F.col("v"))
    # symmetric closure: propagate both directions with one join shape
    sym = materialized(
        edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
    )

    labels = materialized(
        sym.select(F.col("u").alias("node")).distinct()
        .withColumn("component", F.col("node"))
    )

    for _ in range(max_rounds):
        # min label over each node's neighbors — one keyed shuffle
        neighbor_min = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy(sym["u"].alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = materialized(
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                (F.col("nbr_min") < F.col("component")).alias("changed"),
            )
        )
        n_changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.select("node", "component")
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components: no convergence in {max_rounds} rounds "
        "(graph diameter exceeds budget — raise max_rounds or switch "
        "to alternating large-star/small-star)"
    )


def dedup_clusters(pairs: DataFrame) -> DataFrame:
    """Cluster assignment for transitive near-dup dedup: every node of
    the pair graph labeled with its cluster representative (minimum
    doc_id in the connected component). Docs absent from ``pairs`` are
    singletons — they are their own representative and are deliberately
    not enumerated (at corpus scale the pair graph is ≪ the corpus; a
    left join + coalesce(component, doc_id) recovers the total
    labeling without materializing it)."""
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_rep")
    )
