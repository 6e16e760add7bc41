"""2-D computational geometry: hulls, simplification, clipping, ellipses.

TPU-native rebuild of the reference geometry toolbox
(reference: cpp/src/DO/Sara/Geometry/ — Algorithms/ConvexHull.cpp,
RamerDouglasPeucker.cpp, SutherlandHodgman.cpp, EllipseIntersection.cpp,
Objects/Ellipse.hpp, Tools/Projective.hpp). Batched operations are jnp;
inherently sequential algorithms (hull, RDP) run host-side on NumPy, which
is where the reference runs them too (CPU single-thread).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Host-side polygon algorithms.
# ---------------------------------------------------------------------------

def _cross2(a, b) -> float:
    """2-D scalar cross product (np.cross on 2-vectors is deprecated)."""
    return float(a[0] * b[1] - a[1] * b[0])


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain. points: (N, 2) -> CCW hull vertices (M, 2)."""
    pts = np.unique(np.asarray(points, float), axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and _cross2(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


def ramer_douglas_peucker(poly: np.ndarray, eps: float) -> np.ndarray:
    """Polyline simplification (reference: RamerDouglasPeucker.cpp)."""
    poly = np.asarray(poly, float)
    if len(poly) < 3:
        return poly

    def rec(lo, hi):
        a, b = poly[lo], poly[hi]
        d = b - a
        n = np.linalg.norm(d)
        if n < 1e-12:
            dist = np.linalg.norm(poly[lo + 1:hi] - a, axis=1)
        else:
            dn = d / n
            diff = poly[lo + 1:hi] - a
            dist = np.abs(dn[0] * diff[:, 1] - dn[1] * diff[:, 0])
        if len(dist) == 0:
            return [lo]
        k = np.argmax(dist)
        if dist[k] > eps:
            mid = lo + 1 + k
            return rec(lo, mid) + rec(mid, hi)
        return [lo]

    idx = rec(0, len(poly) - 1) + [len(poly) - 1]
    return poly[np.asarray(idx)]


def clip_polygon(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman clipping of a polygon by a convex CCW clip polygon
    (reference: SutherlandHodgman.cpp)."""
    output = list(np.asarray(subject, float))
    clip = np.asarray(clip, float)
    for i in range(len(clip)):
        a = clip[i]
        b = clip[(i + 1) % len(clip)]
        edge = b - a
        input_list = output
        output = []
        if not input_list:
            break

        def inside(p):
            return _cross2(edge, p - a) >= 0

        for j, cur in enumerate(input_list):
            prev = input_list[j - 1]
            ci, pi = inside(cur), inside(prev)
            if ci:
                if not pi:
                    output.append(_segment_intersect(prev, cur, a, b))
                output.append(cur)
            elif pi:
                output.append(_segment_intersect(prev, cur, a, b))
    return np.asarray(output) if output else np.zeros((0, 2))


def _segment_intersect(p, q, a, b):
    """Intersection of line pq with line ab."""
    d1 = q - p
    d2 = b - a
    denom = _cross2(d1, d2)
    if abs(denom) < 1e-12:
        return q
    t = _cross2(a - p, d2) / denom
    return p + t * d1


def polygon_area(poly: np.ndarray) -> float:
    """Signed area (CCW positive) via the shoelace formula."""
    p = np.asarray(poly, float)
    x, y = p[:, 0], p[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def point_in_polygon(p, poly: np.ndarray) -> bool:
    """Winding/crossing test."""
    poly = np.asarray(poly, float)
    x, y = p
    inside = False
    j = len(poly) - 1
    for i in range(len(poly)):
        xi, yi = poly[i]
        xj, yj = poly[j]
        if (yi > y) != (yj > y) and \
                x < (xj - xi) * (y - yi) / (yj - yi + 1e-300) + xi:
            inside = not inside
        j = i
    return inside


# ---------------------------------------------------------------------------
# Ellipses (batched, device-friendly).
# ---------------------------------------------------------------------------

def fit_ellipse(points) -> jnp.ndarray:
    """Direct least-squares (Fitzgibbon) conic fit of 2-D points.

    Returns conic coefficients (a, b, c, d, e, f) for
    a x^2 + b xy + c y^2 + d x + e y + f = 0, normalized.
    (reference: ChessboardDetection/EllipseFitting.hpp)
    """
    p = jnp.asarray(points, jnp.float64 if jnp.asarray(points).dtype ==
                    jnp.float64 else jnp.float32)
    x, y = p[:, 0], p[:, 1]
    D = jnp.stack([x * x, x * y, y * y, x, y, jnp.ones_like(x)], axis=-1)
    # Minimize |D c| subject to |c| = 1 -> smallest right singular vector.
    _, _, Vt = jnp.linalg.svd(D, full_matrices=True)
    c = Vt[-1]
    return c / jnp.linalg.norm(c)


def ellipse_parameters(conic: jnp.ndarray):
    """Conic (a,b,c,d,e,f) -> (center (2,), axes (2,), angle).

    Returns semi-axes sorted (major, minor)."""
    a, b, c, d, e, f = (conic[i] for i in range(6))
    M = jnp.asarray([[a, b / 2], [b / 2, c]])
    center = jnp.linalg.solve(2 * M, -jnp.asarray([d, e]))
    # Value of the conic at the center.
    fc = (a * center[0] ** 2 + b * center[0] * center[1] + c * center[1] ** 2
          + d * center[0] + e * center[1] + f)
    evals, evecs = jnp.linalg.eigh(M)
    axes2 = -fc / evals
    axes = jnp.sqrt(jnp.maximum(axes2, 0.0))
    order = jnp.argsort(-axes)
    axes = axes[order]
    v = evecs[:, order[0]]
    angle = jnp.arctan2(v[1], v[0])
    return center, axes, angle


def ellipse_points(center, axes, angle, n: int = 64) -> jnp.ndarray:
    """Sample n points on an ellipse boundary."""
    t = jnp.linspace(0, 2 * jnp.pi, n, endpoint=False)
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    x = axes[0] * jnp.cos(t)
    y = axes[1] * jnp.sin(t)
    return jnp.stack([center[0] + ca * x - sa * y,
                      center[1] + sa * x + ca * y], axis=-1)


def ellipse_intersection_area(c1, a1, t1, c2, a2, t2, n: int = 256) -> float:
    """Area of intersection of two ellipses by polygon clipping of dense
    boundary samplings (reference: EllipseIntersection.cpp solves the quartic
    analytically; the polygonal approximation here converges ~O(1/n^2))."""
    p1 = np.asarray(ellipse_points(jnp.asarray(c1), jnp.asarray(a1),
                                   jnp.asarray(t1), n))
    p2 = np.asarray(ellipse_points(jnp.asarray(c2), jnp.asarray(a2),
                                   jnp.asarray(t2), n))
    inter = clip_polygon(p1, p2)
    if len(inter) < 3:
        return 0.0
    return abs(polygon_area(inter))
