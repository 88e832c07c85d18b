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
    """(id, vec, cid, sqdist) — each vector's nearest centroid, as a PURE
    MAP: the centroid table collapses to ONE broadcast row holding a
    cid-sorted array of (cid, cvec) structs, and the per-vector winner is
    ``array_min`` over the per-centroid (sqd, cid) structs — lexicographic
    struct ordering IS the (asc sqdist, asc cid) tie rule, unchanged from
    the previous min_by spelling.

    Scale shape (r09 rewrite): the old form exploded N x k scored ROWS
    through a min_by partial aggregate + a vid-keyed exchange; this form
    moves zero rows — same FLOPs, no materialized blowup, no shuffle.
    The centroid update (elementwise_mean) is now the ONLY exchange per
    Lloyd iteration.  Measured on the SemDeDup xl twin corpus (sf0.1,
    k=88, N=44k, min-of-2, same co-tenancy): the iters=1 assign pair
    13.6 s -> 3.7 s."""
    carr = cents.groupBy().agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("cid").alias("cid"), F.col("cvec").alias("cvec"))
            )
        ).alias("_cents")
    )
    best = F.array_min(
        F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                sqdist(F.col(vec_col), c["cvec"]).alias("sqd"),
                c["cid"].alias("cid"),
            ),
        )
    )
    return (
        vecs.crossJoin(F.broadcast(carr))
        .select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("v"),
            best.alias("_b"),
        )
        .select(
            "vid",
            "v",
            F.col("_b.cid").alias("cid"),
            F.col("_b.sqd").alias("sqd"),
        )
    )


def kmeans_assign(
    vecs: DataFrame,
    k: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids_sink: list | None = None,
    keep_vec: bool = False,
) -> DataFrame:
    """``iters`` Lloyd update iterations from the k lowest-id seed
    vectors, then a final assignment against the last centroids:
    (vid, cid, sqd) — one row per input vector.  Pass ``centroids_sink``
    (a list) to also receive the final (cid, cvec) centroid frame — the
    SemDeDup representative rule scores members against their cluster
    centroid, and re-fitting to get it would double the kmeans work.
    ``keep_vec=True`` adds the vector itself as ``v`` — downstream pair
    stages consume (id, vec, cluster) together, and re-joining the input
    on vid to get the vector back would shuffle the whole corpus (r09:
    the semantic_dedup_pairs re-attach join).

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
    out = _assign(vecs, cents, id_col, vec_col)
    return out if keep_vec else out.select("vid", "cid", "sqd")
