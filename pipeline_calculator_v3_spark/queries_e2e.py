"""End-to-end + UDF-surface queries (SURVEY.md §2.B q_parallel_overlap's
full-pipeline twin and q_udf_surface)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .plans import synth
from .plans.overlap import analyze_pipelines
from .queries import query


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


@query("q_overlap_summary")  # rows-only (clamps + parameter echo)
def q_overlap_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 22's result envelope: totals, clamped effective length, savings,
    analysis-parameter echo (src/pipeline_calculator_v3.py:872-896)."""
    return analyze_pipelines(synth.pipelines_df(spark, sf_dir))["summary"]


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
