"""Polyline resampling into fixed-length segments — reference op 11
(``segment_pipeline``, src/pipeline_calculator_v3.py:254-289).

1 polyline -> N segment rows (UDTF shape).  Pure-geometry inner loop with
per-vertex state (accumulated arc length, interpolated cut points), so it
runs as a vectorized-per-group ``applyInPandas`` kernel: numpy math, Arrow
batch transfer, no row-at-a-time Python.

Semantics relative to the reference (documented precisely, review r12):
- cut the polyline every ``segment_length`` meters of accumulated arc
  length, linearly interpolating split points within edges in RAW lon/lat
  (src/pipeline_calculator_v3.py:273-275 does the same raw-coordinate
  lerp, so antimeridian-crossing edges behave identically on both sides);
- each segment emits {midpoint, bearing, length, segment_index}
  (src/pipeline_calculator_v3.py:277-282) — with one DELIBERATE
  divergence: this kernel places the station at the segment's true arc
  MIDPOINT (cut + L/2) with the cut-to-cut bearing.  The reference's
  while-loop (:272-281) labels the segment END 'midpoint' and, after the
  first station of an edge, resets its interpolation origin to the last
  station while still dividing by the ORIGINAL full edge length — so its
  stations geometrically drift within any edge long enough to hold two or
  more stations (the common case at L=5 m).  Replicating that would be
  reproducing a positional bug, not a semantic; the clean resampler is
  pinned instead by this module's goldens, the SQL-replay oracle
  (tests/test_segmentize_oracle.py), and spacing/coverage property tests.
  Downstream faces replay THIS spelling in their oracles.
- the sub-segment tail remainder is dropped here and accounted separately by
  the effective-length tails (src/pipeline_calculator_v3.py:839-845)

Scale: groups are single pipelines (thousands of vertices at most), so group
skew is bounded; the shuffle key is pipeline_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions.geodesy import EARTH_RADIUS_M

SEGMENT_SCHEMA = (
    "pipeline_id bigint, seg_index bigint, mid_lon double, mid_lat double, "
    "bearing double, length double"
)


def _haversine_np(lat1, lon1, lat2, lon2):
    lat1, lon1, lat2, lon2 = map(np.radians, (lat1, lon1, lat2, lon2))
    a = (
        np.sin((lat2 - lat1) / 2) ** 2
        + np.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) / 2) ** 2
    )
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.minimum(1.0, a)))


def _bearing_np(lat1, lon1, lat2, lon2):
    lat1, lon1, lat2, lon2 = map(np.radians, (lat1, lon1, lat2, lon2))
    dlon = lon2 - lon1
    y = np.sin(dlon) * np.cos(lat2)
    x = np.cos(lat1) * np.sin(lat2) - np.sin(lat1) * np.cos(lat2) * np.cos(dlon)
    return (np.degrees(np.arctan2(y, x)) + 360.0) % 360.0


def _segment_group(pdf: pd.DataFrame, segment_length: float) -> pd.DataFrame:
    pdf = pdf.sort_values("pos")
    lon = pdf["lon"].to_numpy(float)
    lat = pdf["lat"].to_numpy(float)
    pid = int(pdf["pipeline_id"].iloc[0])
    if len(lon) < 2:  # degenerate rows skipped (src/pipeline_calculator_v3.py:259)
        return pd.DataFrame(
            columns=["pipeline_id", "seg_index", "mid_lon", "mid_lat", "bearing", "length"]
        )
    edge_len = _haversine_np(lat[:-1], lon[:-1], lat[1:], lon[1:])
    cum = np.concatenate(([0.0], np.cumsum(edge_len)))
    total = cum[-1]
    n_seg = int(total // segment_length)
    if n_seg == 0:
        return pd.DataFrame(
            columns=["pipeline_id", "seg_index", "mid_lon", "mid_lat", "bearing", "length"]
        )

    def interp(dist):
        """Linear interpolation of points at arc distances (:273-275)."""
        e = np.clip(np.searchsorted(cum, dist, side="right") - 1, 0, len(edge_len) - 1)
        frac = np.where(edge_len[e] > 0, (dist - cum[e]) / edge_len[e], 0.0)
        return lon[e] + frac * (lon[e + 1] - lon[e]), lat[e] + frac * (lat[e + 1] - lat[e])

    cuts = np.arange(n_seg + 1) * segment_length
    mids = cuts[:-1] + segment_length / 2.0
    cut_lon, cut_lat = interp(cuts)
    mid_lon, mid_lat = interp(mids)
    bearing = _bearing_np(cut_lat[:-1], cut_lon[:-1], cut_lat[1:], cut_lon[1:])
    return pd.DataFrame(
        {
            "pipeline_id": np.full(n_seg, pid, dtype=np.int64),
            "seg_index": np.arange(n_seg, dtype=np.int64),
            "mid_lon": mid_lon,
            "mid_lat": mid_lat,
            "bearing": bearing,
            "length": np.full(n_seg, segment_length),
        }
    )


def segmentize(vertices: DataFrame, segment_length: float = 5.0) -> DataFrame:
    """(pipeline_id, pos, lon, lat) -> segment table
    (pipeline_id, seg_index, mid_lon, mid_lat, bearing, length)."""
    from ..shipping import ensure_pkg_shipped

    ensure_pkg_shipped(vertices.sparkSession)
    return vertices.groupBy("pipeline_id").applyInPandas(
        lambda pdf: _segment_group(pdf, segment_length), SEGMENT_SCHEMA
    )
