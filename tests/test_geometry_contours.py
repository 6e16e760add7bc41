"""Gates for the exact ellipse intersection and the contour toolbox
(reference: Geometry/Algorithms/EllipseIntersection.cpp, CircleFit.hpp,
BorderFollowing.hpp, Region.cpp, Polyline.hpp)."""

import numpy as np
import pytest

from sara_tpu.core.contours import (BorderType, fit_circle,
                                    polyline_center_of_mass,
                                    polyline_directional_mean,
                                    polyline_length,
                                    polyline_matrix_of_inertia, region_grow,
                                    region_inner_boundary,
                                    suzuki_abe_borders)
from sara_tpu.core.geometry import (ellipse_intersection_area,
                                    ellipse_intersection_area_polygonal,
                                    ellipse_intersection_points,
                                    ellipse_jaccard_similarity,
                                    ellipse_sector_area)


# ---------------------------------------------------------------------------
# Exact ellipse intersection.
# ---------------------------------------------------------------------------

def test_identical_circles_full_overlap():
    a = ellipse_intersection_area((0, 0), (2, 2), 0.0, (0, 0), (2, 2), 0.0)
    assert abs(a - np.pi * 4) < 1e-6


def test_contained_ellipse():
    a = ellipse_intersection_area((0, 0), (5, 4), 0.3, (0.5, 0), (1, 0.5), 1.0)
    assert abs(a - np.pi * 0.5) < 1e-9


def test_disjoint_ellipses():
    a = ellipse_intersection_area((0, 0), (1, 1), 0.0, (5, 0), (1, 1), 0.0)
    assert a == 0.0


def test_two_circles_lens_area_analytic():
    """Two unit circles at distance 1: lens area = 2 cos^-1(d/2) -
    (d/2) sqrt(4-d^2) for r=1."""
    d = 1.0
    expected = 2 * np.arccos(d / 2) - (d / 2) * np.sqrt(4 - d * d)
    a = ellipse_intersection_area((0, 0), (1, 1), 0.0, (d, 0), (1, 1), 0.0)
    assert abs(a - expected) < 1e-9


def test_intersection_points_on_both_boundaries():
    rs = np.random.RandomState(3)
    for _ in range(20):
        c1 = rs.uniform(-1, 1, 2)
        c2 = rs.uniform(-1, 1, 2)
        ax1 = np.sort(rs.uniform(0.5, 3.0, 2))[::-1]
        ax2 = np.sort(rs.uniform(0.5, 3.0, 2))[::-1]
        t1, t2 = rs.uniform(0, np.pi, 2)
        pts = ellipse_intersection_points(c1, ax1, t1, c2, ax2, t2)
        assert len(pts) <= 4
        from sara_tpu.core.geometry import (_conic_at,
                                            conic_equation_of_ellipse)
        s = conic_equation_of_ellipse(c1, ax1, t1)
        t = conic_equation_of_ellipse(c2, ax2, t2)
        for p in pts:
            assert abs(_conic_at(s, p[0], p[1])) < 1e-6
            assert abs(_conic_at(t, p[0], p[1])) < 1e-6


def test_exact_matches_polygonal_on_random_pairs():
    """VERDICT round-2 gate: exact area agrees to ~1e-6 with the CONVERGED
    polygonal approximation on random overlapping pairs. The polygonal
    error is c/n^2, so Richardson extrapolation of n and 2n estimates
    cancels it to O(1/n^4)."""
    rs = np.random.RandomState(0)
    checked = 0
    for _ in range(10):
        c1 = rs.uniform(-0.5, 0.5, 2)
        c2 = rs.uniform(-0.5, 0.5, 2)
        ax1 = np.sort(rs.uniform(0.8, 2.5, 2))[::-1]
        ax2 = np.sort(rs.uniform(0.8, 2.5, 2))[::-1]
        t1, t2 = rs.uniform(0, np.pi, 2)
        exact = ellipse_intersection_area(c1, ax1, t1, c2, ax2, t2)
        a1_ = ellipse_intersection_area_polygonal(c1, ax1, t1, c2, ax2, t2,
                                                  n=512)
        a2_ = ellipse_intersection_area_polygonal(c1, ax1, t1, c2, ax2, t2,
                                                  n=1024)
        approx = (4.0 * a2_ - a1_) / 3.0
        assert abs(exact - approx) < 2e-6 * max(approx, 1.0), (exact, approx)
        checked += 1
    assert checked == 10


def test_jaccard_similarity_bounds():
    j = ellipse_jaccard_similarity((0, 0), (2, 1), 0.2, (0.5, 0.2), (2, 1), 0.4)
    assert 0.0 < j < 1.0
    j_same = ellipse_jaccard_similarity((0, 0), (2, 1), 0.2, (0, 0), (2, 1), 0.2)
    assert abs(j_same - 1.0) < 1e-9


def test_sector_area_full_turn():
    a = ellipse_sector_area((3, 2), -np.pi, np.pi)
    assert abs(a - np.pi * 6) < 1e-9


# ---------------------------------------------------------------------------
# Circle fit.
# ---------------------------------------------------------------------------

def test_circle_fit_exact_on_clean_points():
    t = np.linspace(0, 2 * np.pi, 40, endpoint=False)
    pts = np.stack([3 + 2.5 * np.cos(t), -1 + 2.5 * np.sin(t)], axis=1)
    c, r = fit_circle(pts)
    np.testing.assert_allclose(c, [3, -1], atol=1e-9)
    assert abs(r - 2.5) < 1e-9


def test_circle_fit_noisy_arc():
    rs = np.random.RandomState(1)
    t = np.linspace(0.3, 2.2, 60)
    pts = np.stack([10 + 5 * np.cos(t), 4 + 5 * np.sin(t)], axis=1)
    pts += rs.normal(scale=0.02, size=pts.shape)
    c, r = fit_circle(pts)
    np.testing.assert_allclose(c, [10, 4], atol=0.1)
    assert abs(r - 5) < 0.1


# ---------------------------------------------------------------------------
# Border following / region boundaries.
# ---------------------------------------------------------------------------

def _blob_with_hole(n=32):
    img = np.zeros((n, n), np.int32)
    img[6:26, 6:26] = 1
    img[12:20, 12:20] = 0
    return img


def test_suzuki_abe_outer_and_hole_borders():
    borders = suzuki_abe_borders(_blob_with_hole())
    outers = [b for b in borders.values() if b.type == BorderType.OUTER]
    holes = [b for b in borders.values()
             if b.type == BorderType.HOLE and b.id != 1]
    assert len(outers) == 1
    assert len(holes) == 1
    # Hierarchy: hole's parent is the outer border; outer's parent is frame.
    assert holes[0].parent == outers[0].id
    assert outers[0].parent == 1
    # The outer curve hugs the 20x20 square: all points on its boundary.
    curve = np.asarray(outers[0].curve)
    assert curve[:, 0].min() == 6 and curve[:, 0].max() == 25
    assert curve[:, 1].min() == 6 and curve[:, 1].max() == 25
    on_border = ((curve[:, 0] == 6) | (curve[:, 0] == 25)
                 | (curve[:, 1] == 6) | (curve[:, 1] == 25))
    assert on_border.all()


def test_suzuki_abe_two_components():
    img = np.zeros((20, 40), np.int32)
    img[4:9, 4:12] = 1
    img[10:16, 20:33] = 1
    borders = suzuki_abe_borders(img)
    outers = [b for b in borders.values() if b.type == BorderType.OUTER]
    assert len(outers) == 2
    lens = sorted(len(b.curve) for b in outers)
    # Rect perimeter point counts: 2*(w-1+h-1) for 8-connected tracing.
    assert lens[0] == 2 * (7 + 4)
    assert lens[1] == 2 * (12 + 5)


def test_region_inner_boundary_rectangle():
    img = np.zeros((16, 16), np.int32)
    img[3:9, 4:12] = 7
    b = region_inner_boundary(img, 7)
    assert len(b) == 2 * (7 + 5)
    assert b[:, 0].min() == 4 and b[:, 0].max() == 11
    assert b[:, 1].min() == 3 and b[:, 1].max() == 8
    # Every traced point borders the outside.
    for x, y in b:
        assert img[y, x] == 7


def test_region_grow_flood():
    img = np.zeros((24, 24), np.float32)
    img[5:15, 5:15] = 1.0
    img[8:12, 14:20] = 1.0  # attached arm
    mask = region_grow(img, (6, 6), lambda v: v > 0.5)
    assert mask.sum() == (10 * 10 + 4 * 5)
    assert not mask[0, 0]


# ---------------------------------------------------------------------------
# Polyline statistics.
# ---------------------------------------------------------------------------

def test_polyline_stats():
    p = np.array([[0, 0], [3, 0], [3, 4]], float)
    assert abs(polyline_length(p) - 7) < 1e-12
    com = polyline_center_of_mass(p)
    expected = (np.array([1.5, 0.0]) * 3 + np.array([3.0, 2.0]) * 4) / 7
    np.testing.assert_allclose(com, expected, atol=1e-12)


def test_polyline_directional_mean_straightish():
    p = np.array([[0, 0], [1, 0.1], [2, -0.1], [3, 0]], float)
    ang = polyline_directional_mean(p)
    assert abs(ang) < 0.05


def test_polyline_inertia_of_line():
    p = np.array([[0, 0], [10, 0]], float)
    M = polyline_matrix_of_inertia(p)
    assert M[0, 0] > 0
    assert abs(M[1, 1]) < 1e-12
    assert abs(M[0, 1]) < 1e-12
