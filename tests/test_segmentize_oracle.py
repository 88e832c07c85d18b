"""Independent DuckDB replay of the segmentize UDTF (reference op 11).

q_segmentize stays rows-only in the DRIVER because the resampler's output
is numerically fragile for a typed value-hash: cumulative arc lengths are
summed in different orders (numpy sequential vs DuckDB's segment-tree
window sum), the ~1e-12 coordinate noise that creates is amplified to
~1e-8 in near-north bearings by atan2, and at that noise scale a typed
rounding hash over 45k float values would flip rounding boundaries
intermittently.  The SQL replay is still the strongest available check —
cut counts, edge selection, interpolation, and the bearing formula all
re-derived in SQL from the shared vertex CTE — so it runs HERE, with the
tolerance stated explicitly instead of hidden inside a hash:

- row set (pipeline_id, seg_index): exact
- mid_lon / mid_lat: 1e-9 deg (~0.1 um) absolute
- bearing: 1e-6 deg absolute (atan2 amplification documented above)
"""

from __future__ import annotations

import os

import duckdb
import pytest

from pipeline_calculator_v3_spark.functions.geodesy import haversine_sql
from pipeline_calculator_v3_spark.plans.synth import VERTICES_CTE
from pipeline_calculator_v3_spark.queries import QUERIES

_HAV = haversine_sql("lat", "lon", "lat2", "lon2")

_INTERP_LON = (
    "({p}.lon + (CASE WHEN {p}.el > 0 THEN ({d} - {p}.cum)/{p}.el ELSE 0 END)"
    " * ({p}.lon2 - {p}.lon))"
)
_INTERP_LAT = (
    "({p}.lat + (CASE WHEN {p}.el > 0 THEN ({d} - {p}.cum)/{p}.el ELSE 0 END)"
    " * ({p}.lat2 - {p}.lat))"
)


def _oracle_sql() -> str:
    a_lon, a_lat = _INTERP_LON.format(p="a", d="s.d0"), _INTERP_LAT.format(p="a", d="s.d0")
    b_lon, b_lat = _INTERP_LON.format(p="b", d="s.d1"), _INTERP_LAT.format(p="b", d="s.d1")
    m_lon, m_lat = _INTERP_LON.format(p="m", d="s.dm"), _INTERP_LAT.format(p="m", d="s.dm")
    return f"""
WITH {VERTICES_CTE},
edges0 AS (
    SELECT pipeline_id, pos, lon, lat,
           lead(lon) OVER w AS lon2, lead(lat) OVER w AS lat2
    FROM vertices
    WINDOW w AS (PARTITION BY pipeline_id ORDER BY pos)
),
edges AS (
    SELECT pipeline_id, pos, lon, lat, lon2, lat2, {_HAV} AS el
    FROM edges0 WHERE lon2 IS NOT NULL
),
e3 AS (
    SELECT *,
        COALESCE(SUM(el) OVER (PARTITION BY pipeline_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS cum,
        SUM(el) OVER (PARTITION BY pipeline_id) AS total,
        ROW_NUMBER() OVER (PARTITION BY pipeline_id ORDER BY pos) AS eidx,
        COUNT(*) OVER (PARTITION BY pipeline_id) AS n_edges
    FROM edges
),
totals AS (SELECT pipeline_id, ANY_VALUE(total) AS total FROM e3 GROUP BY pipeline_id),
segs AS (
    SELECT pipeline_id, CAST(k AS BIGINT) AS seg_index,
           k * 5.0 AS d0, k * 5.0 + 2.5 AS dm, (k + 1) * 5.0 AS d1
    FROM totals, LATERAL (
        SELECT unnest(range(0, CAST(floor(total / 5.0) AS BIGINT))) AS k)
)
SELECT s.pipeline_id, s.seg_index,
       {m_lon} AS mid_lon, {m_lat} AS mid_lat,
       fmod(degrees(atan2(
         sin(radians({b_lon} - {a_lon})) * cos(radians({b_lat})),
         cos(radians({a_lat})) * sin(radians({b_lat}))
         - sin(radians({a_lat})) * cos(radians({b_lat}))
           * cos(radians({b_lon} - {a_lon}))
       )) + 360.0, 360.0) AS bearing,
       5.0 AS length
FROM segs s
JOIN e3 a ON a.pipeline_id = s.pipeline_id
         AND a.cum <= s.d0 AND (s.d0 < a.cum + a.el OR a.eidx = a.n_edges)
JOIN e3 m ON m.pipeline_id = s.pipeline_id
         AND m.cum <= s.dm AND (s.dm < m.cum + m.el OR m.eidx = m.n_edges)
JOIN e3 b ON b.pipeline_id = s.pipeline_id
         AND b.cum <= s.d1 AND (s.d1 < b.cum + b.el OR b.eidx = b.n_edges)
"""


@pytest.mark.parametrize("sf_env", [None])
def test_segmentize_matches_sql_replay(spark, sf_dir, sf_env):
    s = (
        QUERIES["q_segmentize"](spark, sf_dir)
        .toPandas()
        .sort_values(["pipeline_id", "seg_index"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'orders.parquet')}')"
    )
    o = (
        con.execute(_oracle_sql())
        .df()
        .sort_values(["pipeline_id", "seg_index"])
        .reset_index(drop=True)
    )
    assert len(s) == len(o) and len(s) > 0
    assert (s.pipeline_id.to_numpy() == o.pipeline_id.to_numpy()).all()
    assert (s.seg_index.to_numpy() == o.seg_index.to_numpy()).all()
    assert (s.mid_lon - o.mid_lon).abs().max() < 1e-9
    assert (s.mid_lat - o.mid_lat).abs().max() < 1e-9
    # bearing: circular delta (359.9999 vs 0.0001 must count as 2e-4)
    d = (s.bearing - o.bearing).abs()
    d = d.combine(360.0 - d, min)
    assert d.max() < 1e-6
    assert (s.length == 5.0).all()
