"""Connected components over near-dup pair lists — the step that turns
pairwise dedup output (ngram_jaccard / minhash / simhash / embedding pairs)
into dedup CLUSTERS: every doc labeled with the min doc-id of its component,
so one survivor per cluster can be kept with a single groupBy.

Algorithm: iterative min-label propagation (the MapReduce-CC shape of
Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14 —
simple alternating rounds rather than their optimized star operations):
each node starts labeled with itself; every round each node takes the min
of its own label and its neighbors' labels; converged when a round changes
nothing. Rounds needed ≈ graph diameter — near-dup clusters are dense and
shallow (a handful of rounds), NOT web-graph chains.

Scale notes (100 TB):
- Each round is one equi-join (edges ⋈ labels on src) + one groupBy(dst)
  min — both shuffle on node id; no collect, no driver state beyond the
  per-round changed-count aggregate.
- ``localCheckpoint`` truncates lineage every round: without it the plan
  doubles per iteration and Catalyst analysis time explodes long before
  the data does.
- Edges are held symmetric (a→b and b→a) so propagation needs no
  direction handling; self-loops carry each node's own label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iters: int = 20,
    out_node: str = "doc",
    out_component: str = "component",
) -> DataFrame:
    """Label every node reachable through ``pairs`` with the minimum node id
    of its connected component. Only nodes appearing in at least one pair
    are returned (callers union singletons back if they need every row).

    Deterministic: min-label is order-independent, so the result does not
    depend on partitioning or iteration scheduling.
    """
    edges = (
        pairs.select(F.col(src_col).alias("s"), F.col(dst_col).alias("t"))
        .unionByName(pairs.select(F.col(dst_col).alias("s"), F.col(src_col).alias("t")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        # neighbor-propagated candidate labels, then keep the per-node min
        # of (current label, best neighbor label)
        prop = (
            edges.join(labels, edges["s"] == labels["node"])
            .select(F.col("t").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(prop, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias(
                    "new_label"
                ),
                "label",
            )
        ).localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("new_label") != F.col("label")).count()
        labels = new_labels.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds — "
            "component diameter exceeds max_iters; raise it for chain-shaped graphs"
        )
    return labels.select(
        F.col("node").alias(out_node), F.col("label").alias(out_component)
    )
