"""Property-based tests (hypothesis) — SURVEY.md §5 item 4.

Spark implementations of the two non-trivial patterns (2-index gap
sessionization, distance self-join) are checked against brute-force pure-
Python mirrors on small random inputs.  Complements the oracle gate: DuckDB
shares our SQL formulation, the brute force does not.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from pipeline_calculator_v3_spark.operators.spatial import distance_self_join


# --- sessionization: Spark lag/sum vs a straight loop ----------------------

def brute_sessions(hits: list[tuple[int, int]]) -> list[int]:
    """Reference rule (src/pipeline_calculator_v3.py:421-422): new section
    when seg1 delta > 2 OR seg2 delta > 2 (signed), over sorted hits."""
    out = []
    sec = 0
    prev = None
    for s1, s2 in sorted(hits):
        if prev is None or s1 - prev[0] > 2 or s2 - prev[1] > 2:
            sec += 1
        out.append(sec)
        prev = (s1, s2)
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1, max_size=60, unique=True,
    )
)
def test_sessionize_matches_brute_force(spark, hits):
    df = spark.createDataFrame(
        [(1, 2, s1, s2) for s1, s2 in hits], "p1 long, p2 long, seg1 long, seg2 long"
    )
    w = Window.partitionBy("p1", "p2").orderBy("seg1", "seg2")
    flagged = df.select(
        "p1", "p2", "seg1", "seg2",
        F.when(
            (F.col("seg1") - F.lag("seg1").over(w) > 2)
            | (F.col("seg2") - F.lag("seg2").over(w) > 2)
            | F.lag("seg1").over(w).isNull(),
            1,
        ).otherwise(0).alias("is_new"),
    )
    got = (
        flagged.withColumn(
            "sec", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .orderBy("seg1", "seg2")
        .select("sec")
        .collect()
    )
    assert [r.sec for r in got] == brute_sessions(hits)


# --- distance join: grid-bucket join vs brute-force pair scan --------------

def hav(lat1, lon1, lat2, lon2):
    R = 6371008.8
    a = (
        math.sin(math.radians(lat2 - lat1) / 2) ** 2
        + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2))
        * math.sin(math.radians(lon2 - lon1) / 2) ** 2
    )
    return 2 * R * math.asin(math.sqrt(min(1.0, a)))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(
            st.integers(1, 4),                      # pipeline
            st.integers(0, 30),                     # seg index
            st.integers(-40, 40), st.integers(-40, 40),  # offsets in ~meters
        ),
        min_size=2, max_size=40,
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_distance_join_matches_brute_force(spark, pts):
    # place points within ~80 m of a base location; radius 15 m
    base_lon, base_lat = -103.5, 31.5
    rows = [
        (
            p, i,
            base_lon + dx / (111320.0 * math.cos(math.radians(base_lat))),
            base_lat + dy / 111320.0,
        )
        for p, i, dx, dy in pts
    ]
    df = spark.createDataFrame(
        rows, "pipeline_id long, seg_index long, mid_lon double, mid_lat double"
    )
    got = {
        (r.p1, r.seg1, r.p2, r.seg2)
        for r in distance_self_join(df, 15.0).collect()
    }
    expect = set()
    for (pa, ia, lona, lata) in rows:
        for (pb, ib, lonb, latb) in rows:
            if pa < pb and hav(lata, lona, latb, lonb) <= 15.0:
                expect.add((pa, ia, pb, ib))
    # boundary tolerance: drop pairs within 1 ulp-ish of the radius from the
    # comparison (the two formulations may differ in the last bit)
    def near_edge(t):
        a = next(r for r in rows if (r[0], r[1]) == (t[0], t[1]))
        b = next(r for r in rows if (r[0], r[1]) == (t[2], t[3]))
        return abs(hav(a[3], a[2], b[3], b[2]) - 15.0) < 1e-6
    assert {t for t in got ^ expect if not near_edge(t)} == set()
