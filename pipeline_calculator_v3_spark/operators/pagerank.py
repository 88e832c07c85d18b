"""PageRank over a directed edge table — the canonical iterative-dataflow
workload (power iteration), complementing connected components (label
propagation) and the recursive CTE (declarative iteration).

Pure DataFrame ops: each round is one join (rank flows along out-edges,
pre-divided by out-degree) + one aggregate, with the damping teleport and
the dangling-node mass folded in as scalar corrections.  The driver loop
is bounded by ``iterations`` — PageRank's contraction rate is the damping
factor, so 10-20 rounds reach practical convergence regardless of graph
size; each round localCheckpoints (lineage cut) and frees its predecessor,
the same O(1)-pinned-state lifecycle as operators/clusters.py.

Scale shape: ranks and the degree-normalized edge table both shuffle on
the vertex id — one exchange family per round; the dangling-mass term is
a single-row aggregate broadcast back.  No collect of vertex state ever
reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import local_checkpoint_tracked, track_ids, unpersist_ids


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """(src, dst) directed edges -> (id, rank), Sum(rank) == n_vertices
    (the random-surfer normalization where the uniform rank is 1.0).

    Dangling vertices (no out-edges) redistribute their mass uniformly —
    without that term the rank sum decays every round and the
    conservation invariant (tests/test_pagerank.py) fails."""
    if iterations <= 0:
        raise ValueError("iterations must be positive")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    # "dangling" (no out-edges) is a STATIC vertex property: flag it once at
    # build time and carry it inside the ranks frame, so the per-round
    # dangling-mass term collapses from a distinct + anti-join exchange
    # (the r05 shape) into a bare single-row aggregate over ranks.
    vertices_ids: list[int] = []
    vertices = local_checkpoint_tracked(
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
        .join(
            e.select(F.col("src").alias("id")).distinct()
            .withColumn("has_out", F.lit(True)),
            "id",
            "left",
        )
        .select("id", (~F.coalesce(F.col("has_out"), F.lit(False))).alias("dangling")),
        ids_sink=vertices_ids,
    )
    n = vertices.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    links_ids: list[int] = []
    links = local_checkpoint_tracked(
        e.join(out_deg, "src").select("src", "dst", "deg"),
        ids_sink=links_ids,
    )
    ranks_ids: list[int] = []
    ranks = local_checkpoint_tracked(
        vertices.withColumn("rank", F.lit(1.0)), ids_sink=ranks_ids
    )
    for _ in range(iterations):
        contrib = (
            links.join(ranks, links.src == ranks.id)
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        # mass parked on dangling vertices: a one-row aggregate over the
        # checkpointed ranks (flag precomputed above) — no per-round join
        dangling = ranks.agg(
            F.coalesce(
                F.sum(F.when(F.col("dangling"), F.col("rank"))), F.lit(0.0)
            ).alias("dm")
        )
        new_ids: list[int] = []
        new_ranks = local_checkpoint_tracked(
            ranks.select("id", "dangling")
            .join(contrib, F.col("id") == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                "dangling",
                (
                    (1.0 - damping)
                    + damping
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.col("dm") / n)
                ).alias("rank"),
            ),
            ids_sink=new_ids,
        )
        unpersist_ids(ranks.sparkSession, ranks_ids)
        ranks, ranks_ids = new_ranks, new_ids
    unpersist_ids(ranks.sparkSession, vertices_ids)
    unpersist_ids(ranks.sparkSession, links_ids)
    # the FINAL checkpoint backs the returned frame: register it so
    # release_caches can free it after the caller materializes (same
    # contract as connected_components' final labels table)
    track_ids(ranks_ids)
    return ranks.select("id", "rank")
