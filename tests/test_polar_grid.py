"""Latitude safety of the grid-bucket distance join (r04 judge finding):
cells sized for the default 60-degree service bound under-cover longitude
above it, so a true pair at polar latitudes could silently vanish.  The fix
is two-fold — data-derived cell size (max_abs_lat_deg=None) and a loud
executor-side guard when an explicit bound is exceeded."""

from __future__ import annotations

import math

import pytest

from pipeline_calculator_v3_spark.operators.spatial import (
    _MAX_GRID_LAT_DEG,
    cell_size_deg,
    distance_self_join,
)

# A planted pair at latitude 70: ~14.85 m apart in pure longitude, which is
# ~1.44 of the OLD default cells (15 m sized for 60 deg) — positioned to
# straddle TWO cell boundaries, i.e. exactly the geometry the old default
# silently missed (floor delta 2 > the 3x3 neighborhood).
_LAT = 70.0
_OLD_CELL = 15.0 / (111000.0 * math.cos(math.radians(60.0)))
_LON1 = _OLD_CELL * 0.999
_LON2 = _LON1 + 3.9e-4  # 3.9e-4 deg * 111320*cos(70) m/deg = 14.85 m


def _planted(spark):
    return spark.createDataFrame(
        [(1, 0, _LON1, _LAT), (2, 0, _LON2, _LAT)],
        "pipeline_id long, seg_index long, mid_lon double, mid_lat double",
    )


def test_polar_pair_found_with_data_derived_bound(spark):
    got = distance_self_join(_planted(spark), 15.0, max_abs_lat_deg=None).collect()
    assert [(r.p1, r.p2, round(r.dist_m, 1)) for r in got] == [(1, 2, 14.8)]


def test_polar_pair_found_with_explicit_bound(spark):
    got = distance_self_join(_planted(spark), 15.0, max_abs_lat_deg=70.0).collect()
    assert [(r.p1, r.p2) for r in got] == [(1, 2)]


def test_exceeding_explicit_bound_raises_not_misses(spark):
    """Data above the declared bound must fail LOUDLY — the old behavior was
    a silently-empty result for exactly this input."""
    with pytest.raises(Exception, match="service bound"):
        distance_self_join(_planted(spark), 15.0).collect()


def test_equatorial_cells_cover_latitude(spark):
    """The old cell constant (111000 m/deg) marginally under-covered
    LATITUDE near the equator (true value there: 110,567 m/deg).  A pair
    14.9 m apart in pure latitude straddling two cell boundaries must
    survive; cells must span at least one radius of latitude anywhere."""
    cell = cell_size_deg(15.0, 0.0)
    assert cell * 110567.0 >= 15.0
    lat1 = cell * 0.999
    lat2 = lat1 + 14.9 / 111000.0  # 14.9 m of latitude, just under radius
    df = spark.createDataFrame(
        [(1, 0, 10.0, lat1), (2, 0, 10.0, lat2)],
        "pipeline_id long, seg_index long, mid_lon double, mid_lat double",
    )
    got = distance_self_join(df, 15.0, max_abs_lat_deg=1.0).collect()
    assert [(r.p1, r.p2) for r in got] == [(1, 2)]


def test_cell_size_capped_near_poles():
    # beyond the cap the cell stops growing — finite cells, never 1/cos(90)
    assert cell_size_deg(15.0, 89.99) == cell_size_deg(15.0, _MAX_GRID_LAT_DEG)
