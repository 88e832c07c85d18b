"""GRS80 exact-geodesic kernel tests (SURVEY.md §7 parity hard-part).

Ground truths are independent of the kernel under test:
- sphere limit: f=0 must reproduce great-circle distances (vs the engine's
  separate haversine implementation);
- meridian arc: numerically integrated M(phi) = a(1-e^2)/(1-e^2 sin^2 phi)^1.5
  (textbook meridian radius of curvature), mm-accurate with Simpson's rule;
- equatorial arc: the equator is a geodesic, s = a * delta_lambda exactly.
"""

from __future__ import annotations

import numpy as np
import pytest

from pipeline_calculator_v3_spark.functions.geodesy import EARTH_RADIUS_M
from pipeline_calculator_v3_spark.functions.geodesy_exact import (
    GRS80_A,
    GRS80_F,
    vincenty_inverse_m,
)


def _haversine_np(lat1, lon1, lat2, lon2, r=EARTH_RADIUS_M):
    la1, lo1, la2, lo2 = map(np.radians, (lat1, lon1, lat2, lon2))
    a = (
        np.sin((la2 - la1) / 2) ** 2
        + np.cos(la1) * np.cos(la2) * np.sin((lo2 - lo1) / 2) ** 2
    )
    return 2.0 * r * np.arcsin(np.sqrt(np.minimum(1.0, a)))


def _meridian_arc_m(phi_deg: float) -> float:
    """Meridian arc length from the equator to phi by Simpson integration of
    the meridian radius of curvature — independent ground truth."""
    e2 = GRS80_F * (2.0 - GRS80_F)
    phi = np.radians(phi_deg)
    n = 200_001  # odd for Simpson
    x = np.linspace(0.0, phi, n)
    m = GRS80_A * (1.0 - e2) / np.power(1.0 - e2 * np.sin(x) ** 2, 1.5)
    h = x[1] - x[0]
    return float(h / 3.0 * (m[0] + m[-1] + 4 * m[1:-1:2].sum() + 2 * m[2:-2:2].sum()))


def test_sphere_limit_matches_haversine():
    rng = np.random.default_rng(7)
    lat1 = rng.uniform(-80, 80, 500)
    lon1 = rng.uniform(-180, 180, 500)
    lat2 = lat1 + rng.uniform(-5, 5, 500)
    lon2 = lon1 + rng.uniform(-5, 5, 500)
    s = vincenty_inverse_m(lat1, lon1, lat2, lon2, a=EARTH_RADIUS_M, f=0.0)
    h = _haversine_np(lat1, lon1, lat2, lon2)
    np.testing.assert_allclose(s, h, rtol=1e-9, atol=1e-6)


def test_meridian_arc_mm_accuracy():
    for phi in (10.0, 31.5, 45.0, 60.0, 89.0):
        s = float(vincenty_inverse_m(np.array([0.0]), np.array([0.0]),
                                     np.array([phi]), np.array([0.0]))[0])
        assert s == pytest.approx(_meridian_arc_m(phi), abs=2e-3), phi


def test_equatorial_arc_exact():
    for dlon in (0.5, 10.0, 90.0, 150.0):
        s = float(vincenty_inverse_m(np.array([0.0]), np.array([0.0]),
                                     np.array([0.0]), np.array([dlon]))[0])
        assert s == pytest.approx(GRS80_A * np.radians(dlon), abs=1e-3), dlon


def test_symmetry_and_zero():
    rng = np.random.default_rng(11)
    lat1 = rng.uniform(-60, 60, 200)
    lon1 = rng.uniform(-180, 180, 200)
    lat2 = lat1 + rng.uniform(-2, 2, 200)
    lon2 = lon1 + rng.uniform(-2, 2, 200)
    ab = vincenty_inverse_m(lat1, lon1, lat2, lon2)
    ba = vincenty_inverse_m(lat2, lon2, lat1, lon1)
    np.testing.assert_allclose(ab, ba, rtol=1e-12, atol=1e-9)
    zz = vincenty_inverse_m(lat1, lon1, lat1, lon1)
    np.testing.assert_allclose(zz, 0.0, atol=1e-9)


def test_haversine_divergence_bound():
    """The documented engine-wide bound: haversine within ~0.6% of the exact
    ellipsoidal distance (functions/geodesy.py:8).  The worst case is a
    meridian arc at the equator, where the ellipsoid's radius of curvature
    (6335.4 km) is furthest below the mean sphere radius: ~0.562%."""
    rng = np.random.default_rng(13)
    lat1 = rng.uniform(-70, 70, 1000)
    lon1 = rng.uniform(-180, 180, 1000)
    lat2 = lat1 + rng.uniform(-3, 3, 1000)
    lon2 = lon1 + rng.uniform(-3, 3, 1000)
    s = vincenty_inverse_m(lat1, lon1, lat2, lon2)
    h = _haversine_np(lat1, lon1, lat2, lon2)
    keep = s > 1.0  # relative bound meaningless at sub-meter separations
    rel = np.abs(h[keep] - s[keep]) / s[keep]
    assert rel.max() < 0.006


def test_fixture_scale_separation():
    """At the reference fixture locale (lat 31.5), the synthetic field's
    ~8.54 m pipeline spacing must read within 0.5% of haversine — the
    detection-range margins survive either kernel."""
    lat = np.full(8, 31.5)
    lon0 = np.full(8, -103.5)
    lon1 = lon0 + 0.00009
    s = vincenty_inverse_m(lat, lon0, lat, lon1)
    h = _haversine_np(lat, lon0, lat, lon1)
    assert np.all(np.abs(s - h) / s < 0.005)
    assert np.all((s > 8.0) & (s < 9.2))


def test_nan_propagation():
    out = vincenty_inverse_m(
        np.array([np.nan, 10.0]), np.array([0.0, 0.0]),
        np.array([1.0, 11.0]), np.array([1.0, np.nan]),
    )
    assert np.isnan(out[0]) and np.isnan(out[1])


def test_spark_udf_matches_numpy(spark):
    from pyspark.sql import functions as F

    from pipeline_calculator_v3_spark.functions.geodesy_exact import geodesic_m
    from pipeline_calculator_v3_spark.shipping import ensure_pkg_shipped

    ensure_pkg_shipped(spark)
    rng = np.random.default_rng(17)
    rows = [
        (float(a), float(b), float(c), float(d))
        for a, b, c, d in zip(
            rng.uniform(-60, 60, 64), rng.uniform(-179, 179, 64),
            rng.uniform(-60, 60, 64), rng.uniform(-179, 179, 64),
        )
    ]
    df = spark.createDataFrame(rows, "lat1 double, lon1 double, lat2 double, lon2 double")
    got = np.array(
        df.select(
            geodesic_m(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("s")
        ).toPandas()["s"]
    )
    arr = np.array(rows)
    want = vincenty_inverse_m(arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3])
    np.testing.assert_allclose(got, want, rtol=1e-12)
