"""Vectorized numpy geometry kernels.

Re-implementations (from the public formulas, not ports) of the
reference's geometry library semantics — ``util/geo/Geo.h`` — used
inside Arrow-batched pandas UDFs / applyInPandas groups. Everything is
float64 and fully vectorized; no per-row Python in hot paths.
"""

from __future__ import annotations

import numpy as np

# Reference constants (Geo.h:1630-1658; public web-mercator math)
EARTH_R = 6378137.0
MERC_K = 3189068.5  # EARTH_R / 2


def latlng_to_webmerc(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """WGS84 degrees -> web-mercator meters (Geo.h:1630-1637)."""
    x = np.asarray(lon, dtype=np.float64) * 111319.4907932735677
    y = np.log(np.tan(np.pi / 4.0 + np.deg2rad(np.asarray(lat, np.float64)) / 2.0)) * EARTH_R
    return x, y


def webmerc_to_latlng(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`latlng_to_webmerc` (Geo.h:1640-1646)."""
    lon = np.asarray(x, dtype=np.float64) / 111319.4907932735677
    lat = np.rad2deg(2.0 * np.arctan(np.exp(np.asarray(y) / EARTH_R)) - np.pi / 2.0)
    return lon, lat


def webmerc_dist_factor(y: np.ndarray) -> np.ndarray:
    """cos(lat) correction factor for metric distances on the mercator
    plane (Geo.h:1669-1676)."""
    lat = 2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / EARTH_R)) - np.pi / 2.0
    return np.cos(lat)


def dist(ax, ay, bx, by) -> np.ndarray:
    return np.hypot(np.asarray(bx) - ax, np.asarray(by) - ay)


def dist_to_segment(px, py, x1, y1, x2, y2) -> np.ndarray:
    """Point -> segment distance, clamped projection (Geo.h:1077-1110)."""
    px, py = np.asarray(px, np.float64), np.asarray(py, np.float64)
    dx, dy = np.asarray(x2) - x1, np.asarray(y2) - y1
    len2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - x1) * dx + (py - y1) * dy) / len2
    t = np.clip(np.where(len2 > 0, t, 0.0), 0.0, 1.0)
    qx, qy = x1 + t * dx, y1 + t * dy
    return np.hypot(px - qx, py - qy)


def project_on(px, py, x1, y1, x2, y2) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Clamped projection of point onto segment: (qx, qy, t)
    (Geo.h:1113-1146)."""
    px, py = np.asarray(px, np.float64), np.asarray(py, np.float64)
    dx, dy = np.asarray(x2) - x1, np.asarray(y2) - y1
    len2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - x1) * dx + (py - y1) * dy) / len2
    t = np.clip(np.where(len2 > 0, t, 0.0), 0.0, 1.0)
    return x1 + t * dx, y1 + t * dy, t


def point_in_polygon(px, py, poly_x: np.ndarray, poly_y: np.ndarray) -> np.ndarray:
    """Vectorized ray-cast point-in-polygon over many points, one polygon
    (the PIP operator; reference winding test Geo.h:303-347)."""
    px, py = np.asarray(px, np.float64), np.asarray(py, np.float64)
    x1, y1 = poly_x, poly_y
    x2, y2 = np.roll(poly_x, -1), np.roll(poly_y, -1)
    # for each point, count crossings over all polygon edges
    pxe = px[:, None]
    pye = py[:, None]
    cond = ((y1 <= pye) & (y2 > pye)) | ((y2 <= pye) & (y1 > pye))
    with np.errstate(divide="ignore", invalid="ignore"):
        xs = x1 + (pye - y1) / (y2 - y1) * (x2 - x1)
    crossings = np.sum(cond & (xs > pxe), axis=1)
    return (crossings % 2) == 1


def douglas_peucker(xs: np.ndarray, ys: np.ndarray, eps: float) -> np.ndarray:
    """Polyline simplification; returns boolean keep-mask
    (reference ``simplify`` Geo.h:1041-1075, applied with 0.5 m)."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = dist_to_segment(xs[i + 1 : j], ys[i + 1 : j], xs[i], ys[i], xs[j], ys[j])
        k = int(np.argmax(seg))
        if seg[k] > eps:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def densify(xs: np.ndarray, ys: np.ndarray, d: float) -> tuple[np.ndarray, np.ndarray]:
    """Insert points so no segment exceeds length d (Geo.h:1533-1558)."""
    out_x, out_y = [xs[0]], [ys[0]]
    for i in range(1, len(xs)):
        seg = np.hypot(xs[i] - xs[i - 1], ys[i] - ys[i - 1])
        n = max(1, int(np.ceil(seg / d)))
        ts = np.linspace(0.0, 1.0, n + 1)[1:]
        out_x.extend(xs[i - 1] + ts * (xs[i] - xs[i - 1]))
        out_y.extend(ys[i - 1] + ts * (ys[i] - ys[i - 1]))
    return np.asarray(out_x), np.asarray(out_y)


MAX_DENSIFY_PTS = 256  # cap the O(n^2) DP: seg grows with path length
                       # (the reference's fixed 50 m grid assumes city-
                       # scale hops; the cap keeps the DP bounded on
                       # arbitrarily long inputs without changing the
                       # metric's resolution below the cap)


def _eff_seg(xs, ys, seg: float) -> float:
    total = float(np.hypot(np.diff(xs), np.diff(ys)).sum())
    return max(seg, total / MAX_DENSIFY_PTS)


def frechet_dist(ax, ay, bx, by, seg: float = 50.0) -> float:
    """Discrete Fréchet distance after densification
    (Eiter/Mannila DP; reference Geo.h:1560-1600)."""
    ax = np.asarray(ax, np.float64); ay = np.asarray(ay, np.float64)
    bx = np.asarray(bx, np.float64); by = np.asarray(by, np.float64)
    seg = max(_eff_seg(ax, ay, seg), _eff_seg(bx, by, seg))
    ax, ay = densify(ax, ay, seg)
    bx, by = densify(bx, by, seg)
    p, q = len(ax), len(bx)
    d = np.hypot(ax[:, None] - bx[None, :], ay[:, None] - by[None, :])
    ca = np.empty((p, q))
    ca[0, 0] = d[0, 0]
    for j in range(1, q):
        ca[0, j] = max(ca[0, j - 1], d[0, j])
    for i in range(1, p):
        ca[i, 0] = max(ca[i - 1, 0], d[i, 0])
        # row-wise DP (inner loop unavoidable; rows are short post-densify)
        for j in range(1, q):
            ca[i, j] = max(min(ca[i - 1, j], ca[i - 1, j - 1], ca[i, j - 1]), d[i, j])
    return float(ca[p - 1, q - 1])


def acc_frechet_dist(ax, ay, bx, by, seg: float = 25.0) -> float:
    """Accumulated Fréchet variant (reference Geo.h:1602-1627) — sum of
    per-step distances along the optimal coupling, normalized by steps."""
    ax = np.asarray(ax, np.float64); ay = np.asarray(ay, np.float64)
    bx = np.asarray(bx, np.float64); by = np.asarray(by, np.float64)
    seg = max(_eff_seg(ax, ay, seg), _eff_seg(bx, by, seg))
    ax, ay = densify(ax, ay, seg)
    bx, by = densify(bx, by, seg)
    p, q = len(ax), len(bx)
    d = np.hypot(ax[:, None] - bx[None, :], ay[:, None] - by[None, :])
    ca = np.empty((p, q))
    ca[0, 0] = d[0, 0]
    for j in range(1, q):
        ca[0, j] = ca[0, j - 1] + d[0, j]
    for i in range(1, p):
        ca[i, 0] = ca[i - 1, 0] + d[i, 0]
        for j in range(1, q):
            ca[i, j] = min(ca[i - 1, j], ca[i - 1, j - 1], ca[i, j - 1]) + d[i, j]
    return float(ca[p - 1, q - 1] / max(p, q))
