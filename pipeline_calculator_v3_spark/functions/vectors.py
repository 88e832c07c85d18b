"""Embedding-vector math as higher-order Column functions.

Operates on ``array<float>`` columns (the ``embeddings.embedding`` schema).
All math is promoted to double *before* multiplication so Spark and the
DuckDB oracle (which casts unnested elements to DOUBLE) agree bit-for-bit up
to summation order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_to_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    """NULL for a zero vector (undefined similarity), matching DuckDB's
    silent x/0.0 -> NULL — without the NULLIF, Spark's default ANSI mode
    raises DIVIDE_BY_ZERO and one zero embedding (a padding row, a dead
    feature) kills the whole job."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def elementwise_mean(
    df,
    group_cols: list[str],
    vec_col: str,
    out_col: str,
    round_dp: int | None = None,
):
    """Element-wise mean of a vector column per group, rebuilt as an
    ordered array: posexplode -> (group, dim) hash aggregate (map-side
    combine collapses each partition to |groups| x dim rows) ->
    array_sort(collect_list(struct(dim, mean))) reassembly.  The ONE
    spelling of the dimension-ordering subtlety (struct sort leads on the
    dim field) shared by the kmeans centroid update and the hybrid-RRF
    query vector — review r07 caught the two hand-rolled copies.

    ``round_dp`` rounds each mean (kmeans rounds to 9 dp so cross-engine
    summation noise cannot propagate); None keeps raw doubles.
    """
    m = F.avg(F.col("_x").cast("double"))
    if round_dp is not None:
        m = F.round(m, round_dp)
    dims = df.select(*group_cols, F.posexplode(vec_col).alias("_d", "_x"))
    return (
        dims.groupBy(*group_cols, "_d")
        .agg(m.alias("_m"))
        .groupBy(*group_cols)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_d", "_m"))),
                lambda s: s["_m"],
            ).alias(out_col)
        )
    )


def cosine_sql(a: str, b: str) -> str:
    """DuckDB oracle spelling of :func:`cosine` over already-DOUBLE list
    columns — sequential ``list_sum`` matches the Spark left-fold order
    (the oracle-helper pattern: ONE helper emits the formula both engines
    run, so a tweak cannot silently fork them).

    NULL semantics pinned to the Spark side (review r12, verified live):
    DuckDB's ``list_sum`` SKIPS NULL elements while Spark's aggregate
    left-fold propagates them (and ``zip_with`` NULL-pads ragged pairs),
    so a NULL element or a length mismatch forked the two engines
    (Spark NULL vs a DuckDB partial sum).  The guard makes the oracle
    propagate NULL for exactly those rows; NULL-free same-length inputs —
    every fixture — are value-identical to the unguarded spelling."""
    dirty = (
        f"len(list_filter({a}, x -> x IS NULL)) > 0"
        f" OR len(list_filter({b}, x -> x IS NULL)) > 0"
        f" OR len({a}) <> len({b})"
    )
    core = (
        f"(list_sum(list_transform(list_zip({a}, {b}), z -> z[1] * z[2]))"
        f" / NULLIF(sqrt(list_sum(list_transform({a}, x -> x * x)))"
        f" * sqrt(list_sum(list_transform({b}, x -> x * x))), 0.0))"
    )
    return f"(CASE WHEN {dirty} THEN NULL ELSE {core} END)"


def sqdist_sql(a: str, b: str) -> str:
    """DuckDB oracle spelling of operators/kmeans.sqdist (squared L2 as a
    sequential list_sum left-fold; ``pow`` could round differently)."""
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"z -> (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)) "
        f"* (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))))"
    )


def unit_normalize(a: Column) -> Column:
    """Unit-normalize a vector column: v / ||v|| in double precision,
    NULL for a zero vector (same quarantine rule as :func:`cosine`).

    The ingest-time form of the r09 norm hoists: normalize ONCE when the
    embedding is written and every downstream cosine — pair stages,
    top-k scans, centroid scoring — collapses to a bare dot product (the
    norm product is exactly 1), removing the norm arithmetic AND the
    norm column from every shuffle.  tests/test_vectors.py gates the
    identity cosine(a, b) == dot(unit(a), unit(b)) to double tolerance
    (not bit-identity: dividing before the dot reassociates the
    rounding, which is why the in-query hoists keep dot/(na*nb) instead
    of silently switching an oracle-backed face to this form).

    Evaluation count (advice r09): referencing an outer aggregate inside a
    ``transform`` lambda re-evaluates it PER ELEMENT (Spark does not CSE
    across HOF lambda bodies — and a norm materialized in a prior select
    is re-inlined by CollapseProject, so a call-site column is no
    barrier).  ``array_repeat(norm, d)`` evaluates the O(d) norm ONCE and
    fans the scalar out, so the whole expression stays O(d) per row: one
    norm for the repeat, one for the zero gate."""
    n = norm(a)
    return F.when(
        n != 0.0,
        F.zip_with(
            _to_double(a),
            F.array_repeat(n, F.size(a)),
            lambda x, nn: x / nn,
        ),
    )
