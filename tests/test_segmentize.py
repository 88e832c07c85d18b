"""Unit/property tests for the segmentize kernel (reference op 11) against
closed-form geometry — SURVEY.md §5's property-test strategy."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.functions.geodesy import EARTH_RADIUS_M
from pipeline_calculator_v3_spark.operators.segmentize import segmentize

# ~5 m of latitude in degrees on the haversine sphere.
DEG_PER_M_LAT = 180.0 / (math.pi * EARTH_RADIUS_M)


def _vertices(spark, rows):
    return spark.createDataFrame(rows, "pipeline_id long, pos long, lon double, lat double")


def test_straight_north_line(spark):
    # 400 m due-north line (FIXTURES.md G2 shape): expect 80 segments of 5 m,
    # bearing ~0, midpoints on the meridian.
    # 400 m + 1 cm: the haversine round-trip of an exact 400 m step lands at
    # 399.999999… and floor() would drop the 80th segment.
    lat_step = 400.01 * DEG_PER_M_LAT
    v = _vertices(
        spark,
        [(1, 0, -103.5, 31.5), (1, 1, -103.5, 31.5 + lat_step)],
    )
    seg = segmentize(v, 5.0).orderBy("seg_index").collect()
    assert len(seg) == 80
    assert all(abs(s.bearing) < 1e-6 or abs(s.bearing - 360.0) < 1e-6 for s in seg)
    assert all(abs(s.mid_lon - (-103.5)) < 1e-12 for s in seg)
    # midpoint of segment k sits at (k + 0.5) * 5 m along the line
    mid_lat_0 = 31.5 + 2.5 * DEG_PER_M_LAT
    assert abs(seg[0].mid_lat - mid_lat_0) < 1e-9


def test_tail_remainder_dropped(spark):
    # 12 m line -> 2 full segments, 2 m tail dropped
    # (tails are handled by effective-length, src/pipeline_calculator_v3.py:839-845)
    lat_step = 12.0 * DEG_PER_M_LAT
    v = _vertices(spark, [(7, 0, 10.0, 45.0), (7, 1, 10.0, 45.0 + lat_step)])
    seg = segmentize(v, 5.0).collect()
    assert len(seg) == 2


def test_degenerate_single_vertex(spark):
    # <2 coords skipped, not fatal (src/pipeline_calculator_v3.py:259)
    v = _vertices(spark, [(3, 0, 0.0, 0.0)])
    assert segmentize(v, 5.0).count() == 0


def test_multi_edge_additivity(spark):
    # Splitting a straight line into collinear sub-edges must not change the
    # segmentation (length additivity property, SURVEY.md §5).
    lat_step = 100.0 * DEG_PER_M_LAT
    one_edge = _vertices(spark, [(1, 0, 0.0, 10.0), (1, 1, 0.0, 10.0 + lat_step)])
    three_edge = _vertices(
        spark,
        [
            (1, 0, 0.0, 10.0),
            (1, 1, 0.0, 10.0 + 0.3 * lat_step),
            (1, 2, 0.0, 10.0 + 0.7 * lat_step),
            (1, 3, 0.0, 10.0 + lat_step),
        ],
    )
    a = segmentize(one_edge, 5.0).orderBy("seg_index").toPandas()
    b = segmentize(three_edge, 5.0).orderBy("seg_index").toPandas()
    assert len(a) == len(b) == 20
    assert (abs(a.mid_lat - b.mid_lat) < 1e-9).all()


def test_segment_count_matches_length(spark):
    # n_segments == floor(total_length / 5) on the synthetic vertices
    from pipeline_calculator_v3_spark.plans import synth

    v = synth.vertices_df(spark, "/root/testdata/sf0.001")
    seg_counts = (
        segmentize(v, 5.0).groupBy("pipeline_id").count().orderBy("pipeline_id")
    )
    from pipeline_calculator_v3_spark.queries import QUERIES

    lengths = QUERIES["q_geodesic_length"](spark, "/root/testdata/sf0.001")
    joined = seg_counts.join(lengths, "pipeline_id").select(
        "pipeline_id", "count", F.floor(F.col("length_m") / 5.0).alias("expect")
    )
    bad = joined.where(F.col("count") != F.col("expect")).collect()
    assert bad == []
