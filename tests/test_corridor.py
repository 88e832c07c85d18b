"""Corridor polygon kernel unit tests (reference ops 16-17,
src/pipeline_calculator_v3.py:432-712) — Douglas-Peucker centerline
decimation keeps straight-corridor rings tiny without moving any bend."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pipeline_calculator_v3_spark.operators.corridor import (
    DECIMATION_TOL_M,
    _douglas_peucker,
    corridor_polygons,
)

DEG_PER_M_LAT = 1.0 / 111320.0


def test_dp_collapses_collinear():
    pts = np.stack([np.zeros(100), np.arange(100.0) * 5.0], axis=1)
    out = _douglas_peucker(pts, 0.25)
    assert len(out) == 2
    assert (out[0] == pts[0]).all() and (out[-1] == pts[-1]).all()


def test_dp_preserves_bends_within_tol():
    rng = np.random.default_rng(7)
    pts = np.cumsum(rng.normal(scale=3.0, size=(200, 2)), axis=0)
    tol = 0.5
    out = _douglas_peucker(pts, tol)
    assert 2 <= len(out) < len(pts)
    # every dropped point is within tol of the simplified polyline
    kept_idx = {tuple(p) for p in out}
    seg_starts, seg_ends = out[:-1], out[1:]
    for p in pts:
        if tuple(p) in kept_idx:
            continue
        d = seg_ends - seg_starts
        t = np.clip(
            np.einsum("ij,ij->i", p - seg_starts, d)
            / np.maximum(np.einsum("ij,ij->i", d, d), 1e-12),
            0.0,
            1.0,
        )
        proj = seg_starts + t[:, None] * d
        assert np.hypot(*(proj - p).T).min() <= tol + 1e-9


def test_dp_keeps_right_angle_corner():
    leg1 = np.stack([np.zeros(50), np.arange(50.0) * 5.0], axis=1)
    leg2 = np.stack([np.arange(1.0, 50.0) * 5.0, np.full(49, 245.0)], axis=1)
    pts = np.vstack([leg1, leg2])
    out = _douglas_peucker(pts, 0.25)
    assert len(out) == 3  # two endpoints + the corner
    assert (out[1] == np.array([0.0, 245.0])).all()


def _straight_hits(spark, n_stations=80, sep_m=10.0, lat0=31.5):
    """Synthetic section hits: two parallel north-running lines."""
    lon_off = sep_m / (111320.0 * math.cos(math.radians(lat0)))
    rows = [
        (
            1, 2, 0, i, i,
            -103.5, lat0 + i * 5.0 * DEG_PER_M_LAT,
            -103.5 - lon_off, lat0 + i * 5.0 * DEG_PER_M_LAT,
            sep_m,
        )
        for i in range(n_stations)
    ]
    return spark.createDataFrame(
        rows,
        "p1 bigint, p2 bigint, section bigint, seg1 bigint, seg2 bigint, "
        "a_mid_lon double, a_mid_lat double, b_mid_lon double, "
        "b_mid_lat double, dist_m double",
    )


def test_straight_corridor_ring_is_decimated(spark):
    sec = corridor_polygons(_straight_hits(spark)).collect()
    assert len(sec) == 1
    ring = sec[0].corridor_polygon
    # 80 stations -> ~162 ring points undecimated; collinear centerline
    # collapses to 2 points -> 5-point closed ring
    assert len(ring) <= 7
    assert ring[0] == ring[-1]
    # geometry survives: ring spans the full section length (~400 m)
    lat_span_m = (
        max(p["lat"] for p in ring) - min(p["lat"] for p in ring)
    ) / DEG_PER_M_LAT
    assert 390.0 <= lat_span_m <= 430.0


def test_bent_corridor_keeps_corner(spark):
    lat0 = 31.5
    lon_m = 111320.0 * math.cos(math.radians(lat0))
    # L-shape: 40 stations north, then 40 east
    pts = [(-103.5, lat0 + i * 5.0 * DEG_PER_M_LAT) for i in range(40)]
    pts += [
        (-103.5 + j * 5.0 / lon_m, lat0 + 39 * 5.0 * DEG_PER_M_LAT)
        for j in range(1, 41)
    ]
    lon_off = 10.0 / lon_m
    rows = [
        (1, 2, 0, i, i, lon, lat, lon - lon_off, lat, 10.0)
        for i, (lon, lat) in enumerate(pts)
    ]
    df = spark.createDataFrame(
        rows,
        "p1 bigint, p2 bigint, section bigint, seg1 bigint, seg2 bigint, "
        "a_mid_lon double, a_mid_lat double, b_mid_lon double, "
        "b_mid_lat double, dist_m double",
    )
    sec = corridor_polygons(df).collect()[0]
    ring = sec.corridor_polygon
    assert ring[0] == ring[-1]
    # corner preserved: some ring point lies near the inside elbow
    elbow_lon, elbow_lat = pts[39]
    near = [
        p
        for p in ring
        if abs((p["lon"] - elbow_lon) * lon_m) < 25.0
        and abs(p["lat"] - elbow_lat) / DEG_PER_M_LAT < 25.0
    ]
    assert near, "no ring vertex near the corridor elbow"
    # still far fewer points than stations
    assert len(ring) < 30


def test_decimation_tol_is_sub_width():
    # invariant the kernel relies on: tolerance far below any half-width
    # (min width = 2 * clamped detection range 1 m -> half_w >= 1 m)
    assert DECIMATION_TOL_M <= 0.5


def test_corridor_across_antimeridian(spark):
    """Review r06: a section straddling +-180 used to average raw lons to
    ~0 (wrong side of the planet) with a globe-spanning bbox.  After the
    unwrap the center sits at the line and the bbox spans meters, not the
    globe."""
    import pandas as pd

    from pipeline_calculator_v3_spark.operators.corridor import _corridor_group

    rows = []
    for i in range(40):
        lon_a = 179.9995 + i * 0.00002          # crosses 180 at i=25
        lon_a = lon_a - 360.0 if lon_a > 180.0 else lon_a
        lon_b = lon_a + 0.0001                  # ~8.5 m east at lat 40
        lon_b = lon_b - 360.0 if lon_b > 180.0 else lon_b
        rows.append((1, 2, 1, i, i, lon_a, 40.0, lon_b, 40.0, 9.0))
    pdf = pd.DataFrame(
        rows,
        columns=["p1", "p2", "section", "seg1", "seg2", "a_mid_lon",
                 "a_mid_lat", "b_mid_lon", "b_mid_lat", "dist_m"],
    )
    out = _corridor_group(pdf, 15.0, 5.0).iloc[0]
    # center is AT the line (unwrapped frame: ~180.0005), never ~0
    assert abs(abs(out["center_lon"]) - 180.0) < 0.01
    # bbox spans the ~0.0009 deg of the section, not ~360
    assert out["max_lon"] - out["min_lon"] < 0.01


def test_width_floor_and_padding_track_segment_length(spark):
    """Reference :555-562: width floors at segment_length and the end
    padding is max(segment_length, 5) — both invisible at the default
    5 m (max_sep + 10 >= 10 > 5) but binding for larger legal segment
    lengths (review r12)."""
    import pandas as pd

    from pipeline_calculator_v3_spark.operators.corridor import (
        _corridor_group,
    )

    rows = [(1, 2, 1, i, i, -100.0 + i * 0.0001, 40.0,
             -100.0 + i * 0.0001, 40.00008, 9.0) for i in range(10)]
    pdf = pd.DataFrame(
        rows,
        columns=["p1", "p2", "section", "seg1", "seg2", "a_mid_lon",
                 "a_mid_lat", "b_mid_lon", "b_mid_lat", "dist_m"],
    )
    default = _corridor_group(pdf, 15.0, 5.0).iloc[0]
    assert default["oriented_width_m"] == pytest.approx(9.0 + 10.0)
    wide = _corridor_group(pdf, 100.0, 50.0).iloc[0]
    # floor binds: max(9 + 10, 50) = 50, under the 200 m clamp
    assert wide["oriented_width_m"] == pytest.approx(50.0)
    # padding binds too: the oriented ring extends ~50 m past each end
    # (~76 m of stations + 2 x 50 m pad along the axis)
    ring = wide["oriented_polygon"]
    lons = [pt["lon"] for pt in ring]
    span_m = (max(lons) - min(lons)) * 111320.0 * 0.766  # cos(40 deg)
    assert span_m > 76 + 2 * 45


def test_oriented_rect_centers_on_mean_offset():
    """Reference :544/:568-571: the rectangle's lateral center is the
    centerline's MEAN perpendicular offset, not the first point's —
    anchoring at s[0] shifts a curved centerline's rectangle sideways
    and can leave far-offset points outside it (review r12)."""
    import numpy as np

    from pipeline_calculator_v3_spark.operators.corridor import (
        _oriented_rect,
    )

    # L-ish centerline: axis is x (first->last), but most points sit at
    # a large positive y offset; s[0] = 0 while s_mean ~ 36
    cl = np.array([[0.0, 0.0], [10.0, 40.0], [50.0, 40.0],
                   [90.0, 40.0], [100.0, 0.0]])
    rect = _oriented_rect(cl, half_w=25.0, pad=5.0)
    ys = rect[:, 1]
    s_mean = cl[:, 1].mean()
    assert (ys.min() + ys.max()) / 2.0 == pytest.approx(s_mean)
    # every centerline point within the lateral band
    assert all(ys.min() <= y <= ys.max() for y in cl[:, 1])
