"""End-to-end + UDF-surface queries (SURVEY.md §2.B q_parallel_overlap's
full-pipeline twin and q_udf_surface)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from . import ANGULAR_TOLERANCE_DEG
from .plans import synth
from .plans.overlap import analyze_pipelines, overlap_summary
from .queries import query
from .queries_spatial import (
    _PAIRS_CTE,
    _k_per_segment,
    _persisted_pairs,
    DETECTION_RANGE_M,
    MIN_PARALLEL_M,
    SEG_LEN_M,
)


@query("q_overlap_e2e")  # rows-only: corridor polygons are output-only geometry
def q_overlap_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's entire analyze_complete flow (op 22) over the
    synthetic pipelines: segmentize -> distance join -> sessions -> sections
    with corridor polygons.  Returns the sections table (flattened polygons
    to counts for a stable rows-only schema)."""
    pipes = synth.pipelines_df(spark, sf_dir)
    res = analyze_pipelines(pipes)
    return res["sections"].select(
        "p1", "p2", "section", "n_hits", "bundled_length_m",
        "average_separation", "oriented_width_m",
        F.size("oriented_polygon").cast("bigint").alias("n_rect_pts"),
        F.size("corridor_polygon").cast("bigint").alias("n_corridor_pts"),
    )


@query(
    "q_overlap_summary",
    oracle=f"""
WITH {synth.SEGMENTS_CTE},
{_PAIRS_CTE},
neighbors AS (
    SELECT p1 AS p, seg1 AS i, p2 AS o FROM pairs
    UNION ALL
    SELECT p2 AS p, seg2 AS i, p1 AS o FROM pairs
),
k_per_seg AS (
    SELECT p, i, CAST(COUNT(DISTINCT o) + 1 AS BIGINT) AS k
    FROM neighbors GROUP BY p, i
),
eff AS (
    SELECT s.pipeline_id,
           COUNT(*) * {SEG_LEN_M!r} AS length_m,
           SUM({SEG_LEN_M!r} / COALESCE(k.k, 1)) AS effective_m
    FROM segments s
    LEFT JOIN k_per_seg k ON k.p = s.pipeline_id AND k.i = s.seg_index
    GROUP BY s.pipeline_id
),
tot AS (
    SELECT SUM(length_m) AS total_m, SUM(effective_m) AS raw_effective_m FROM eff
),
clamped AS (
    SELECT total_m,
           LEAST(GREATEST(raw_effective_m, 0.0), total_m) AS effective_m
    FROM tot
)
SELECT ROUND(total_m, 6) AS total_m,
       ROUND(effective_m, 6) AS effective_m,
       ROUND(GREATEST(total_m - effective_m, 0.0), 6) AS savings_m,
       ROUND(CASE WHEN total_m > 0
                  THEN (total_m - effective_m) / total_m * 100.0
                  ELSE 0.0 END, 6) AS savings_pct,
       {DETECTION_RANGE_M!r} AS param_detection_range_m,
       {MIN_PARALLEL_M!r} AS param_min_parallel_m,
       {SEG_LEN_M!r} AS param_segment_length_m,
       {ANGULAR_TOLERANCE_DEG!r} AS param_angular_tolerance_deg
FROM clamped
""",
)
def q_overlap_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 22's result envelope — totals, effective clamped to [0, total],
    savings with div-0 guard, parameter echo
    (src/pipeline_calculator_v3.py:872-896) — driven through the SAME
    ``overlap_summary`` code ``analyze_pipelines`` uses, over the
    oracle-shared synthetic segment field (the full-DAG twin with
    pandas-UDF resampling stays rows-only as q_overlap_e2e).  Float sums
    round to 6 dp on both sides for hash stability."""
    seg = synth.segments_df(spark, sf_dir)
    k = _k_per_segment(_persisted_pairs(seg))
    effective = (
        seg.join(k, (k.p == seg.pipeline_id) & (k.i == seg.seg_index), "left")
        .select("pipeline_id", F.coalesce("k", F.lit(1)).alias("k"))
        .groupBy("pipeline_id")
        .agg(
            (F.count(F.lit(1)) * SEG_LEN_M).alias("length_m"),
            F.sum(F.lit(SEG_LEN_M) / F.col("k")).alias("effective_m"),
        )
    )
    summary = overlap_summary(
        effective,
        DETECTION_RANGE_M,
        MIN_PARALLEL_M,
        SEG_LEN_M,
        ANGULAR_TOLERANCE_DEG,
    )
    return summary.select(
        F.round("total_m", 6).alias("total_m"),
        F.round("effective_m", 6).alias("effective_m"),
        F.round("savings_m", 6).alias("savings_m"),
        F.round("savings_pct", 6).alias("savings_pct"),
        "param_detection_range_m",
        "param_min_parallel_m",
        "param_segment_length_m",
        "param_angular_tolerance_deg",
    )


@query("q_udf_surface")  # rows-only: scalar pandas UDF demo surface
def q_udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDF surface (SURVEY.md §2.B): a vectorized scalar pandas UDF (Arrow
    batches) computing haversine against the JVM column expression —
    max |delta| proves the two paths agree to float precision."""
    from .functions.geodesy import haversine_m
    from .shipping import ensure_pkg_shipped

    ensure_pkg_shipped(spark)

    @pandas_udf("double")
    def hav_np(lat1: pd.Series, lon1: pd.Series, lat2: pd.Series, lon2: pd.Series) -> pd.Series:
        import numpy as np

        la1, lo1, la2, lo2 = map(np.radians, (lat1, lon1, lat2, lon2))
        a = (
            np.sin((la2 - la1) / 2) ** 2
            + np.cos(la1) * np.cos(la2) * np.sin((lo2 - lo1) / 2) ** 2
        )
        return pd.Series(2.0 * 6371008.8 * np.arcsin(np.sqrt(np.minimum(1.0, a))))

    v = synth.vertices_df(spark, sf_dir)
    paired = v.withColumn("lat2", F.col("lat") + 0.001).withColumn(
        "lon2", F.col("lon") + 0.001
    )
    return paired.select(
        "pipeline_id",
        "pos",
        hav_np("lat", "lon", "lat2", "lon2").alias("dist_udf"),
        haversine_m(F.col("lat"), F.col("lon"), F.col("lat2"), F.col("lon2")).alias(
            "dist_jvm"
        ),
        F.abs(
            hav_np("lat", "lon", "lat2", "lon2")
            - haversine_m(F.col("lat"), F.col("lon"), F.col("lat2"), F.col("lon2"))
        ).alias("abs_delta"),
    )


@query("q_udtf_surface")  # rows-only: UDTF path; HOF-equivalence pytest-gated
def q_udtf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (Spark 4, arrow-optimized): a table function
    expanding each document into fixed-size token windows — the UDTF twin
    of operators/chunking.py's pure-HOF expansion, registered + invoked
    via LATERAL join.  tests/test_packing.py proves the two paths emit
    IDENTICAL rows, the same JVM-vs-Python agreement gate q_udf_surface
    applies to scalar UDFs.  The HOF path remains the hot path (no Python
    in the loop); the UDTF exists because user-defined EXPANSIONS are part
    of the declared API surface and some real kernels (parsers, decoders)
    cannot be HOFs."""
    from pyspark.sql.functions import udtf

    from .queries import t as _t
    from .shipping import ensure_pkg_shipped

    ensure_pkg_shipped(spark)

    @udtf(returnType="chunk_idx bigint, n_tokens bigint, first_token string")
    class ChunkWindows:
        def eval(self, text: str):
            toks = [w for w in (text or "").lower().split() if w]
            step, width = 16, 32
            for ci, start in enumerate(range(0, len(toks), step)):
                w = toks[start:start + width]
                yield ci, len(w), w[0]

    spark.udtf.register("pcv3_chunk_windows", ChunkWindows)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.first_token
        FROM docs_udtf d, LATERAL pcv3_chunk_windows(d.text) c
        """
    )
