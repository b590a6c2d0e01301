"""Near-duplicate cluster resolution: distributed connected
components over a dup-pair edge list, and cluster-representative
dedup built on top of the pair generators (dedup.py).

Pair operators (MinHash-LSH, SimHash, n-gram Jaccard) emit edges
``(id_a, id_b)``; turning "pairs" into "keep one doc per duplicate
GROUP" requires the transitive closure — a doc chain a~b~c must
collapse to ONE representative even when (a, c) itself was never
emitted.

Scale design (the 100 TB story): min-label propagation, the same
algorithm GraphX's ``connectedComponents`` runs as a Pregel loop.
Each iteration is one shuffle join (labels × edges, keyed on node id)
plus a map-side-combined min-aggregation; the iteration count is the
cluster *diameter*, which for near-dup graphs is tiny (dup clusters
are dense — mostly 2-10 docs). Lineage is cut per iteration with
``localCheckpoint`` so the plan does not grow with the loop (swap for
``checkpoint`` + a checkpoint dir on a real cluster). The driver only
ever sees one scalar per iteration (the changed-label count used for
convergence) — no row data is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iter: int = 25) -> DataFrame:
    """(node, component) for every node in ``edges``; ``component`` is
    the minimum node id reachable from the node. Min-label
    propagation: labels start as each node's own id and every
    iteration takes the min over the 1-hop neighborhood until a fixed
    point."""
    sym = (edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
           .union(edges.select(F.col(id_b).alias("src"),
                               F.col(id_a).alias("dst")))
           .distinct()
           .persist())
    labels = (sym.select(F.col("src").alias("node")).distinct()
              .withColumn("component", F.col("node")))
    labels = labels.localCheckpoint()
    for _ in range(max_iter):
        nbr = (sym.join(labels.withColumnRenamed("node", "dst")
                        .withColumnRenamed("component", "nbr_component"),
                        "dst")
               .groupBy("src")
               .agg(F.min("nbr_component").alias("nbr_component"))
               .withColumnRenamed("src", "node"))
        new_labels = (labels.join(nbr, "node", "left")
                      .select("node",
                              F.least(F.col("component"),
                                      F.coalesce("nbr_component",
                                                 F.col("component")))
                              .alias("component")))
        new_labels = new_labels.localCheckpoint()
        changed = (new_labels
                   .join(labels.withColumnRenamed("component", "old"), "node")
                   .filter(F.col("component") != F.col("old"))
                   .count())
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels


def dedup_clusters(df: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """Cluster assignment for every document: docs in a dup cluster
    get the cluster's min doc id as ``cluster_id``; singletons (no dup
    edge) are their own cluster. ``df.filter(doc_id == cluster_id)``
    is then the deduplicated corpus (one representative per cluster).
    """
    comp = connected_components(pairs, max_iter=25)
    return (df.select(id_col)
            .join(comp.withColumnRenamed("node", id_col), id_col, "left")
            .select(id_col,
                    F.coalesce("component", F.col(id_col))
                    .alias("cluster_id")))
