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


def semantic_dedup(embeddings: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding", threshold: float = 0.9,
                   method: str = "cells", n_cells: int = 16,
                   seed: int = 42) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): collapse groups of
    semantically near-identical examples (cosine >= ``threshold``) to
    one representative each. Returns every input id with its
    ``cluster_id`` and a ``keep`` flag; ``filter(keep)`` is the
    deduplicated corpus.

    ``method="exact"`` — all-pairs cosine + transitive closure;
    deterministic min-id representative. O(n²): verification scale
    only (it is the policy an oracle can replay).

    ``method="cells"`` — the paper's actual recipe and the 100 TB
    shape: k-means cells partition the corpus (train on MLlib, one
    coarse iterative step), near-dup pairs are found ONLY within a
    cell (the single shuffle is the cell equi-join; cross-cell pairs
    are sacrificed exactly as in the paper), and each duplicate
    group keeps the member FARTHEST from the cell centroid (the
    paper's low-centroid-similarity rule — outliers carry the most
    information), tiebroken by min id.
    """
    from octosql_spark.datapipe.dedup import embedding_near_dup_pairs
    from octosql_spark.datapipe.similarity import _dot

    ids = embeddings.select(F.col(id_col))
    if method == "exact":
        pairs = embedding_near_dup_pairs(
            embeddings, id_col, vec_col, threshold, method="exact")
        cl = dedup_clusters(ids, pairs, id_col)
        return cl.select(id_col, "cluster_id",
                         (F.col(id_col) == F.col("cluster_id")).alias("keep"))
    if method != "cells":
        raise ValueError(method)

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    e = embeddings.select(F.col(id_col).alias("_id"),
                          F.col(vec_col).cast("array<double>").alias("_v"))
    norm = F.sqrt(_dot(F.col("_v"), F.col("_v")))
    e = e.withColumn("_nv", F.transform("_v", lambda x: x / norm))
    model = (KMeans(k=n_cells, seed=seed, featuresCol="features")
             .fit(e.select(array_to_vector("_nv").alias("features"))))
    centers = [list(map(float, c)) for c in model.clusterCenters()]

    def _cell_and_ccos(vec):
        scored = F.array(*[
            F.struct(_dot(vec, F.array(*[F.lit(x) for x in ctr])).alias("c"),
                     F.lit(i).alias("cid"))
            for i, ctr in enumerate(centers)])
        best = F.array_sort(scored)[F.size(scored) - 1]  # max cosine
        return best["cid"].alias("cell"), best["c"].alias("ccos")

    cell, ccos = _cell_and_ccos(F.col("_nv"))
    x = e.select("_id", "_nv", cell, ccos).persist()
    a = x.select(F.col("_id").alias("id_a"), F.col("_nv").alias("_va"),
                 "cell")
    b = x.select(F.col("_id").alias("id_b"), F.col("_nv").alias("_vb"),
                 "cell")
    pairs = (a.join(b, "cell")
             .filter(F.col("id_a") < F.col("id_b"))
             .filter(_dot(F.col("_va"), F.col("_vb")) >= threshold)
             .select("id_a", "id_b"))
    comp = connected_components(pairs, max_iter=25)
    labeled = (x.join(comp.withColumnRenamed("node", "_id"), "_id", "left")
               .select(F.col("_id"), "ccos",
                       F.coalesce("component", F.col("_id"))
                       .alias("cluster_id")))
    # representative = farthest from the centroid (min ccos), min id
    from pyspark.sql.window import Window
    rk = F.row_number().over(
        Window.partitionBy("cluster_id").orderBy(F.col("ccos").asc(),
                                                 F.col("_id").asc()))
    out = (labeled.withColumn("_rk", rk)
           .select(F.col("_id").alias(id_col), "cluster_id",
                   (F.col("_rk") == 1).alias("keep")))
    x.unpersist()
    return out
