"""Corridor polygon geometry — reference ops 15-17
(src/pipeline_calculator_v3.py:432-712), re-implemented as an
``applyInPandas`` kernel over bundled sections.

Per section (grouped (p1, p2, section)) this computes, from the paired
segment midpoints:
- bbox over both midpoint sets + 0.001 deg buffer; center = bbox midpoint
  (src/pipeline_calculator_v3.py:461-474)
- centerline = per-hit average of the paired midpoints, ordered by seg1
  (:479-482)
- oriented rectangle (op 16): local ENU frame (m-per-deg lon scaled by
  cos(lat), :495-496); principal axis first->last centerline point
  (:513-524); (t, s) projection (:529-544); width = max separation + 10 m
  margin clamped to 2 x detection range (:546-559); ends padded (:561-564);
  closed 5-point ring (:567-579)
- curved strip (op 17): centerline offset +-half-width with miter joins,
  bevel fallback when near-parallel or miter length > 6 x half-width
  (:620,651-658); ring = left forward + right reversed (:682); zig-zag
  sanity check falls back to the rectangle (:684-712)

Pure numpy math per group; groups are single corridor sections (bounded
size), shuffled by their (p1, p2, section) key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

M_PER_DEG_LAT = 111320.0  # the reference's ENU constant (:495-496)
WIDTH_MARGIN_M = 10.0     # (:546-559)
MITER_LIMIT = 6.0         # (:620)
BBOX_BUFFER_DEG = 0.001   # (:461-471)
# centerline simplification tolerance; sub-width by construction: under the
# clamped params width = min(dist + 10, 2 * detection_range) with
# detection_range >= 1, so width >= 2 m and half-width >= 1 m — 0.25 m stays
# below the tightest possible half-width (the >= 5.5 m figure only holds for
# the default 15 m range).
DECIMATION_TOL_M = 0.25

CORRIDOR_SCHEMA = (
    "p1 bigint, p2 bigint, section bigint, n_hits bigint, "
    "center_lon double, center_lat double, "
    "min_lon double, max_lon double, min_lat double, max_lat double, "
    "oriented_width_m double, "
    "oriented_polygon array<struct<lon:double, lat:double>>, "
    "corridor_polygon array<struct<lon:double, lat:double>>"
)


def _douglas_peucker(pts: np.ndarray, tol: float) -> np.ndarray:
    """Iterative (stack-based) Douglas-Peucker polyline simplification.

    The 5 m stations put ~2 ring points per station on dead-straight
    corridors; a sub-width tolerance collapses collinear runs so a straight
    section's curved ring drops from ~2N points to ~5 while any real bend
    (deviation > tol) is preserved exactly.
    """
    n = len(pts)
    if n <= 2 or tol <= 0.0:
        return pts
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 - i0 < 2:
            continue
        seg = pts[i1] - pts[i0]
        seg_len = np.hypot(*seg)
        mid = pts[i0 + 1 : i1]
        if seg_len < 1e-12:
            dev = np.hypot(*(mid - pts[i0]).T)
        else:
            # perpendicular distance via 2D cross product
            dev = np.abs(
                (mid[:, 0] - pts[i0, 0]) * seg[1] - (mid[:, 1] - pts[i0, 1]) * seg[0]
            ) / seg_len
        k = int(np.argmax(dev))
        if dev[k] > tol:
            split = i0 + 1 + k
            keep[split] = True
            stack.append((i0, split))
            stack.append((split, i1))
    return pts[keep]


def _ring(points_xy: np.ndarray, lon0: float, lat0: float, m_lon: float):
    """ENU meters -> [{lon, lat}] closed ring."""
    lon = lon0 + points_xy[:, 0] / m_lon
    lat = lat0 + points_xy[:, 1] / M_PER_DEG_LAT
    return [{"lon": float(x), "lat": float(y)} for x, y in zip(lon, lat)]


def _oriented_rect(cl_xy, half_w, pad):
    """5-point closed rectangle around the principal axis (op 16).

    Laterally centered on the MEAN perpendicular offset of the centerline
    (:544 s_mean; corner projections at s_mean +- half_w, :568-571) — a
    curved centerline anchored at its first point's offset instead would
    shift the rectangle sideways and leave far-offset centerline points
    outside it (review r12)."""
    axis = cl_xy[-1] - cl_xy[0]
    norm = np.hypot(*axis)
    if norm < 1e-9:
        axis = np.array([1.0, 0.0])
        norm = 1.0
    u = axis / norm
    v = np.array([-u[1], u[0]])
    t = cl_xy @ u
    s_mean = float((cl_xy @ v).mean())
    t0, t1 = t.min() - pad, t.max() + pad
    corners = np.array(
        [
            u * t0 + v * (s_mean + half_w),
            u * t1 + v * (s_mean + half_w),
            u * t1 + v * (s_mean - half_w),
            u * t0 + v * (s_mean - half_w),
        ]
    )
    return np.vstack([corners, corners[:1]])


def _offset_polyline(
    cl_xy: np.ndarray, half_w: float
) -> tuple[np.ndarray, np.ndarray] | None:
    """Miter-joined one-sided offset (op 17); None -> degenerate.

    Returns ``(points, edge_cl_len)`` where ``edge_cl_len[j]`` is the length
    of the centerline edge that offset edge ``j`` parallels — a legitimate
    offset edge is bounded by it (+ miter deviation) by construction — or
    0.0 for bevel-join edges (which have no centerline counterpart and are
    bounded by the corridor width)."""
    d = np.diff(cl_xy, axis=0)
    lens = np.hypot(d[:, 0], d[:, 1])
    keep = lens > 1e-9
    if keep.sum() == 0:
        return None
    d = d[keep]
    lens = lens[keep]
    pts = np.vstack([cl_xy[:-1][keep], cl_xy[-1]])
    dirs = d / lens[:, None]
    normals = np.stack([-dirs[:, 1], dirs[:, 0]], axis=1)
    out = [pts[0] + normals[0] * half_w]
    edge_cl = []  # per output edge: paralleled centerline edge length
    for i in range(1, len(pts) - 1):
        n_prev, n_next = normals[i - 1], normals[i]
        m = n_prev + n_next
        mn = np.hypot(*m)
        cos_half = mn / 2.0
        if cos_half < 1e-6:  # near-reversal: bevel (:651-658)
            out.append(pts[i] + n_prev * half_w)
            edge_cl.append(lens[i - 1])
            out.append(pts[i] + n_next * half_w)
            edge_cl.append(0.0)  # join edge
            continue
        m = m / mn
        miter_len = half_w / max(cos_half, 1e-9)
        if miter_len > MITER_LIMIT * half_w:  # miter limit 6.0 (:620)
            out.append(pts[i] + n_prev * half_w)
            edge_cl.append(lens[i - 1])
            out.append(pts[i] + n_next * half_w)
            edge_cl.append(0.0)  # join edge
        else:
            out.append(pts[i] + m * miter_len)
            edge_cl.append(lens[i - 1])
    out.append(pts[-1] + normals[-1] * half_w)
    edge_cl.append(lens[-1])
    return np.array(out), np.array(edge_cl)


def _zigzag(ring_xy: np.ndarray, scale: float, edge_cl_len: np.ndarray) -> bool:
    """Sanity heuristic (:684-712): an offset ring whose edges jump far
    beyond the corridor scale indicates a self-intersecting zig-zag.

    Checked PER EDGE against the centerline edge each offset edge parallels
    (``edge_cl_len``, 0 for join/cap edges): a decimated centerline
    legitimately has long straight edges, but only the edge that parallels
    them may be long — join and cap edges keep the original absolute
    10 x scale bound, so a genuine spike shorter than the longest centerline
    edge still trips the check (r02 ADVICE: the global
    ``max > cl_edge_max + 10 x scale`` form masked those)."""
    e = np.diff(ring_xy, axis=0)
    lens = np.hypot(e[:, 0], e[:, 1])
    if not len(lens):
        return False
    return bool(np.any(lens > edge_cl_len + 10.0 * max(scale, 1.0)))


def _corridor_group(
    pdf: pd.DataFrame, detection_range_m: float, segment_length_m: float
) -> pd.DataFrame:
    pdf = pdf.sort_values(["seg1", "seg2"])
    a = pdf[["a_mid_lon", "a_mid_lat"]].to_numpy(float)
    b = pdf[["b_mid_lon", "b_mid_lat"]].to_numpy(float)
    dist = pdf["dist_m"].to_numpy(float)

    # Antimeridian unwrap (review r06): the upstream distance join
    # deliberately emits pairs straddling +-180, where raw lon averaging
    # and min/max produce globe-spanning nonsense.  Unwrap every lon into
    # the first point's 360-degree frame — a corridor section is tens of
    # km at most, so after unwrapping all lons are numerically contiguous
    # (values may exceed +-180; the ENU math only uses differences, and
    # emitted ring/center lons stay in the unwrapped frame, which KML
    # consumers and haversine both accept modulo 360).
    ref = a[0, 0]
    for arr in (a, b):
        arr[:, 0] -= 360.0 * np.round((arr[:, 0] - ref) / 360.0)

    all_pts = np.vstack([a, b])
    min_lon, min_lat = all_pts.min(axis=0) - BBOX_BUFFER_DEG
    max_lon, max_lat = all_pts.max(axis=0) + BBOX_BUFFER_DEG
    center_lon = (min_lon + max_lon) / 2.0
    center_lat = (min_lat + max_lat) / 2.0

    # centerline (:479-482): average of paired midpoints.  Each seg1 appears
    # once per nearby seg2 (up to 5 diagonal hits at the same station) — one
    # centerline point per seg1 station keeps the geometry identical while
    # cutting the polygon ~5x.
    mids = pd.DataFrame(
        {"s": pdf["seg1"].to_numpy(), "x": (a[:, 0] + b[:, 0]) / 2.0,
         "y": (a[:, 1] + b[:, 1]) / 2.0}
    )
    cl = mids.groupby("s", sort=True)[["x", "y"]].mean().to_numpy()
    # de-dup consecutive identical centerline points
    keep = np.ones(len(cl), dtype=bool)
    if len(cl) > 1:
        keep[1:] = np.any(np.abs(np.diff(cl, axis=0)) > 1e-12, axis=1)
    cl = cl[keep]

    m_lon = M_PER_DEG_LAT * max(np.cos(np.radians(center_lat)), 1e-6)
    cl_xy = np.stack(
        [(cl[:, 0] - center_lon) * m_lon, (cl[:, 1] - center_lat) * M_PER_DEG_LAT],
        axis=1,
    )
    cl_xy = _douglas_peucker(cl_xy, DECIMATION_TOL_M)
    # width (:555-559): max over pair separations + 10 m margin, FLOORED
    # at segment_length ("ensure at least a narrow band"), clamped to 2x
    # detection range; padding (:561-562) = max(segment_length, 5 m).
    # At the default 5 m segment length neither segment_length term ever
    # binds (max_sep + 10 >= 10 > 5), so default outputs are unchanged —
    # the floor/padding matter for the clamped-legal larger segment
    # lengths (review r12).
    width = min(
        max(dist.max() + WIDTH_MARGIN_M, segment_length_m),
        2.0 * detection_range_m,
    )
    half_w = width / 2.0
    pad = max(segment_length_m, WIDTH_MARGIN_M / 2.0)  # (:561-562)

    rect_xy = _oriented_rect(cl_xy, half_w, pad)
    oriented = _ring(rect_xy, center_lon, center_lat, m_lon)

    corridor = oriented  # fallback chain curved > oriented (:1358-1402)
    if len(cl_xy) >= 2:
        left = _offset_polyline(cl_xy, half_w)
        right = _offset_polyline(cl_xy[::-1], half_w)
        if left is not None and right is not None:
            left_pts, left_cl = left
            right_pts, right_cl = right
            ring_xy = np.vstack([left_pts, right_pts, left_pts[:1]])
            # ring edge -> centerline-edge bound: left edges, far-end cap
            # (0: bounded by width), right edges, closing cap (0)
            ring_cl = np.concatenate([left_cl, [0.0], right_cl, [0.0]])
            if not _zigzag(ring_xy, width, ring_cl):
                corridor = _ring(ring_xy, center_lon, center_lat, m_lon)

    return pd.DataFrame(
        {
            "p1": [int(pdf["p1"].iloc[0])],
            "p2": [int(pdf["p2"].iloc[0])],
            "section": [int(pdf["section"].iloc[0])],
            "n_hits": [len(pdf)],
            "center_lon": [center_lon],
            "center_lat": [center_lat],
            "min_lon": [min_lon],
            "max_lon": [max_lon],
            "min_lat": [min_lat],
            "max_lat": [max_lat],
            "oriented_width_m": [width],
            "oriented_polygon": [oriented],
            "corridor_polygon": [corridor],
        }
    )


def corridor_polygons(
    section_hits: DataFrame,
    detection_range_m: float = 15.0,
    segment_length_m: float = 5.0,
) -> DataFrame:
    """(p1,p2,section,seg1,seg2,a_mid_*,b_mid_*,dist_m) hits -> one corridor
    geometry row per section."""
    from ..shipping import ensure_pkg_shipped

    ensure_pkg_shipped(section_hits.sparkSession)
    return section_hits.groupBy("p1", "p2", "section").applyInPandas(
        lambda pdf: _corridor_group(pdf, detection_range_m, segment_length_m),
        CORRIDOR_SCHEMA
    )
