"""End-to-end golden parity on the reference's own Brazos/Delaware KMZ —
the debug_analyze.py flow (reference entry point 2, debug_analyze.py:6-45)
as pinned assertions instead of eyeball prints (VERDICT r02 #8).

The reference itself cannot run here (pyproj absent), so ground truth is
(a) the KMZ's independently-recorded GIS_MILES attributes and (b) pinned
values from this engine's deterministic dataflow — any geometry/session/
corridor regression moves them."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pipeline_calculator_v3_spark import release_caches
from pipeline_calculator_v3_spark.plans.overlap import analyze_pipelines
from pipeline_calculator_v3_spark.sources.kml import (
    attrs_to_columns,
    read_pipelines,
    schema_fields,
)

FIXTURE = "/root/reference/test_data/Brazos_NGL and Delaware_Gas combined.kmz"


@pytest.fixture(scope="module")
def brazos(spark):
    pipes = read_pipelines(spark, FIXTURE).cache()
    results = analyze_pipelines(pipes.select("pipeline_id", "name", "geometry"))
    yield pipes, results
    pipes.unpersist()
    release_caches(spark)


def test_pipelines_parsed(brazos):
    pipes, _ = brazos
    # debug_analyze prints 'pipelines: 45' on this fixture
    assert pipes.count() == 45


def test_total_miles_match_recorded_gis(spark, brazos):
    pipes, results = brazos
    fields = schema_fields(spark, FIXTURE)
    typed = attrs_to_columns(pipes, fields)
    recorded = typed.agg(F.sum("GIS_MILES")).collect()[0][0]
    total_mi = results["totals"].collect()[0].total_mi
    # haversine vs the GIS-recorded ellipsoidal miles: measured delta is
    # 0.024% on this corpus (spherical error largely cancels over many
    # headings); 0.1% is the honest regression bound
    assert recorded == pytest.approx(183.957, abs=0.01)  # fixture constant
    assert abs(total_mi - recorded) / recorded < 1e-3
    assert total_mi == pytest.approx(184.0012, abs=0.01)  # engine pin


def test_bundled_sections_stable(brazos):
    _, results = brazos
    secs = results["sections"].collect()
    assert len(secs) == 8
    top = sorted((s.bundled_length_mi for s in secs), reverse=True)
    assert top[0] == pytest.approx(38.4721, abs=1e-3)
    assert top[1] == pytest.approx(12.9587, abs=1e-3)
    # every section clears the 200 m HAVING gate and has corridor geometry
    for s in secs:
        assert s.bundled_length_m >= 200.0
        assert s.corridor_polygon and len(s.corridor_polygon) >= 5


def test_savings_envelope_stable(brazos):
    _, results = brazos
    s = results["summary"].collect()[0]
    assert s.savings_pct == pytest.approx(6.486, abs=0.01)
    assert 0.0 < s.effective_m < s.total_m


def test_total_miles_match_reference_formula_replica(brazos):
    """The reference run itself (debug_analyze.py:6-14) needs pyproj, which
    is absent here — but pyproj.Geod(ellps='GRS80').inv IS Karney's exact
    geodesic on GRS80, and this repo carries its own vectorized GRS80
    Vincenty kernel (functions/geodesy_exact.py, ~0.5 mm agreement away
    from the antipodal regime).  Replicating the reference's exact formula
    — sum |geod.inv| over consecutive vertices per pipeline
    (src/pipeline_calculator_v3.py:216-240), divided by the 1609.347218694
    survey mile (:49) — therefore reproduces what 'total miles' a reference
    run would print, to well inside the pinned 1e-3 mi tolerance.

    Tolerance chain on this fixture (measured):
      replica (ellipsoidal)   183.966754 mi   <- the golden
      recorded GIS_MILES      183.957    mi   (0.005% from replica)
      engine plan (haversine) 184.0012   mi   (0.019% from replica)
    The 2.5e-4 relative band on the plan total documents the
    haversine-vs-GRS80 spherical error for this corpus's heading mix."""
    import numpy as np

    from pipeline_calculator_v3_spark.functions.geodesy_exact import (
        vincenty_inverse_m,
    )

    pipes, results = brazos
    SURVEY_MILE = 1609.347218694
    total_m = 0.0
    for r in pipes.select("geometry").collect():
        arr = np.array([[c[0], c[1]] for c in r.geometry], dtype=float)
        if len(arr) < 2:
            continue
        d = vincenty_inverse_m(arr[:-1, 1], arr[:-1, 0], arr[1:, 1], arr[1:, 0])
        total_m += float(np.abs(d).sum())
    replica_mi = total_m / SURVEY_MILE
    # golden: what the reference's 'total miles' print resolves to
    assert replica_mi == pytest.approx(183.966754, abs=1e-3)
    plan_mi = results["totals"].collect()[0].total_mi
    assert abs(plan_mi - replica_mi) / replica_mi < 2.5e-4
