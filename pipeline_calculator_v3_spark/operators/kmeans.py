"""Distributed Lloyd k-means over a vector column — the clustering
primitive behind corpus bucketing, IVF coarse quantizers, and
topic-style corpus maps.

Spark shape (the IVF lesson, operators/similarity.py): centroids are
tiny and BROADCAST; assignment scores every vector against all k
centroids in place (broadcast nested loop — no shuffle of vectors) and
collapses to the argmin row map-side via ``min_by`` partial aggregation,
so each full vector crosses an exchange once per iteration (for the
centroid update's (cid, dim) mean), never k times.  Nothing about the
vectors ever reaches the driver.

Determinism contract (what makes this oracle-checkable, unlike MLlib's
sampled init): seeds are the k lowest-id vectors; assignment ties break
on the lower centroid id; updated centroid means are ROUNDED to 9 dp on
both engines, so cross-engine summation-order noise (~1e-15) cannot
propagate into later assignments.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sqdist(a: Column, b: Column) -> Column:
    """Squared L2 between two array columns, as an explicit multiply
    left-fold (matches DuckDB's sequential ``list_sum`` order; ``pow``
    could round differently)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(
    vecs: DataFrame, cents: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, vec, cid, sqdist) — each vector's nearest centroid.  min_by
    over (sqdist, cid) reproduces the (asc sqdist, asc cid) window winner
    while aggregating map-side (the IVF review-r06 pattern)."""
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        "cid",
        sqdist(F.col(vec_col), F.col("cvec")).alias("sqd"),
    )
    best = F.min_by(
        F.struct(
            F.col("v").alias("v"),
            F.col("cid").alias("cid"),
            F.col("sqd").alias("sqd"),
        ),
        F.struct(F.col("sqd").alias("s"), F.col("cid").alias("t")),
    )
    return (
        scored.groupBy("vid")
        .agg(best.alias("b"))
        .select(
            "vid",
            F.col("b.v").alias("v"),
            F.col("b.cid").alias("cid"),
            F.col("b.sqd").alias("sqd"),
        )
    )


def kmeans_assign(
    vecs: DataFrame,
    k: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids_sink: list | None = None,
) -> DataFrame:
    """``iters`` Lloyd update iterations from the k lowest-id seed
    vectors, then a final assignment against the last centroids:
    (vid, cid, sqd) — one row per input vector.  Pass ``centroids_sink``
    (a list) to also receive the final (cid, cvec) centroid frame — the
    SemDeDup representative rule scores members against their cluster
    centroid, and re-fitting to get it would double the kmeans work.

    Each iteration costs one broadcast-scored map pass + one (cid, dim)
    mean exchange; centroid means are rounded to 9 dp (see module
    docstring).  A centroid that loses every member during an iteration
    is CARRIED FORWARD unchanged (classical Lloyd / MLlib behavior) —
    without the carry, the mean aggregate emits no row for the empty cid
    and k silently shrinks (advice r07).  The caller aggregates cluster
    stats or joins labels back as needed."""
    if k < 1 or iters < 0:
        raise ValueError(f"need k >= 1, iters >= 0; got k={k}, iters={iters}")
    # persist: the vector frame feeds the seed scan plus one full scoring
    # pass PER iteration (+ the final assignment) — unpersisted, a derived
    # input (e.g. the synthesized xl corpus) re-runs its whole upstream
    # plan iters+2 times
    from ..caching import persist_tracked

    vecs = persist_tracked(vecs)
    cents = (
        vecs.orderBy(id_col)
        .limit(k)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
    )
    from ..functions.vectors import elementwise_mean

    for _ in range(iters):
        assigned = _assign(vecs, cents, id_col, vec_col)
        updated = elementwise_mean(
            assigned, ["cid"], "v", "cvec", round_dp=9
        )
        # empty-cluster carry-forward: k rows in, k rows out, always
        cents = (
            cents.alias("p")
            .join(F.broadcast(updated.alias("u")), "cid", "left")
            .select(
                "cid",
                F.coalesce(F.col("u.cvec"), F.col("p.cvec")).alias("cvec"),
            )
        )
    if centroids_sink is not None:
        centroids_sink.append(cents)
    return _assign(vecs, cents, id_col, vec_col).select("vid", "cid", "sqd")
