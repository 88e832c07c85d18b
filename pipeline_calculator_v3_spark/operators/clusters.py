"""Connected components over candidate-pair edges — the dedup endgame.

Pair detection (MinHash/SimHash/Jaccard) yields EDGES; what a training-data
pipeline actually needs is CLUSTERS (transitive closure) and one surviving
representative per cluster.  This is an iterative label-propagation in pure
DataFrame ops: every node repeatedly adopts the minimum label in its
neighborhood until a fixpoint.  Converges in O(diameter) rounds; each round
is one shuffle on the node id.  (The large-star/small-star optimization
halves rounds for pathological chains; plain propagation is the clear
baseline and near-dup clusters are tiny in practice.)

Driver-side iteration with localCheckpoint per round: keeps the plan from
growing unboundedly (lineage cut), which is what makes iterative DataFrame
algorithms viable at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 20,
) -> DataFrame:
    """(src, dst) undirected edges -> (id, component) with component = min
    node id in the component."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # candidate label per node: min over its own label and neighbors'
        neighbor_min = (
            sym.join(labels, sym.b == labels.id)
            .groupBy("a")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.a, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nmin", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id1",
    dst: str = "id2",
) -> DataFrame:
    """Full dedup decision table: every doc -> (cluster, keep flag).

    Docs in no pair form singleton clusters; within each cluster the minimum
    id survives (deterministic, same rule as fingerprint_dedup)."""
    comp = connected_components(pairs, src, dst)
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("component", F.col("id")).alias("cluster"),
            (F.coalesce("component", F.col("id")) == F.col("id")).alias("keep"),
        )
    )
