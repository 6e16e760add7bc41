"""Tests: geometry toolbox, Kalman filter, MOT (cf. reference
cpp/test/Sara/Geometry/, cpp/test/Sara/KalmanFilter/)."""

import jax.numpy as jnp
import numpy as np

from sara_tpu.core.geometry import (
    convex_hull, ramer_douglas_peucker, clip_polygon, polygon_area,
    point_in_polygon, fit_ellipse, ellipse_parameters, ellipse_points,
    ellipse_intersection_area)
from sara_tpu.tracking import (
    GaussianState, kf_predict, kf_update, constant_velocity_box_model,
    MultiObjectTracker, iou_matrix)


def test_convex_hull_square():
    pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5], [0.2, 0.7]])
    hull = convex_hull(pts)
    assert len(hull) == 4
    assert abs(abs(polygon_area(hull)) - 1.0) < 1e-9


def test_rdp_keeps_corners():
    line = np.array([[0, 0], [1, 0.01], [2, -0.01], [3, 0], [3, 1], [3, 2]])
    simp = ramer_douglas_peucker(line, eps=0.1)
    assert len(simp) == 3
    np.testing.assert_allclose(simp[0], [0, 0])
    np.testing.assert_allclose(simp[1], [3, 0])
    np.testing.assert_allclose(simp[2], [3, 2])


def test_clip_polygon():
    subject = np.array([[0, 0], [2, 0], [2, 2], [0, 2.0]])
    clip = np.array([[1, -1], [3, -1], [3, 3], [1, 3.0]])
    out = clip_polygon(subject, clip)
    assert abs(abs(polygon_area(out)) - 2.0) < 1e-9


def test_point_in_polygon():
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2.0]])
    assert point_in_polygon((1, 1), sq)
    assert not point_in_polygon((3, 1), sq)


def test_ellipse_fit_roundtrip():
    center = np.array([3.0, -2.0])
    axes = np.array([4.0, 1.5])
    ang = 0.6
    pts = np.asarray(ellipse_points(jnp.asarray(center), jnp.asarray(axes),
                                    jnp.asarray(ang), 64))
    conic = fit_ellipse(jnp.asarray(pts))
    c, a, t = ellipse_parameters(conic)
    np.testing.assert_allclose(np.asarray(c), center, atol=1e-3)
    np.testing.assert_allclose(np.sort(np.asarray(a))[::-1], axes, atol=1e-3)


def test_ellipse_intersection_identical():
    c = np.array([0.0, 0.0])
    a = np.array([2.0, 1.0])
    area = ellipse_intersection_area(c, a, 0.0, c, a, 0.0)
    np.testing.assert_allclose(area, np.pi * 2.0 * 1.0, rtol=1e-2)


def test_ellipse_intersection_disjoint():
    a = np.array([1.0, 1.0])
    area = ellipse_intersection_area(np.array([0.0, 0]), a, 0.0,
                                     np.array([10.0, 0]), a, 0.0)
    assert area == 0.0


def test_kf_converges_to_constant_velocity():
    model = constant_velocity_box_model(dt=1.0, q=1e-4, r=0.01)
    state = GaussianState(jnp.zeros(8), jnp.eye(8) * 10.0)
    rs = np.random.RandomState(0)
    for k in range(30):
        z = np.array([k * 2.0, k * 1.0, 10.0, 20.0]) + rs.normal(scale=0.05, size=4)
        state = kf_predict(state, model)
        state, _, _ = kf_update(state, model, jnp.asarray(z))
    x = np.asarray(state.x)
    np.testing.assert_allclose(x[4], 2.0, atol=0.1)   # vx
    np.testing.assert_allclose(x[5], 1.0, atol=0.1)   # vy


def test_iou_matrix():
    a = np.array([[0.0, 0, 2, 2]])
    b = np.array([[0.0, 0, 2, 2], [1, 1, 2, 2], [10, 10, 2, 2]])
    m = iou_matrix(a, b)
    np.testing.assert_allclose(m[0, 0], 1.0)
    np.testing.assert_allclose(m[0, 1], 1.0 / 7.0, atol=1e-6)
    assert m[0, 2] == 0


def test_mot_tracks_two_objects():
    mot = MultiObjectTracker(min_hits=2, max_misses=3)
    ids_seen = {}
    for k in range(12):
        dets = np.array([[10.0 + 2 * k, 10.0, 4, 4],
                         [50.0, 30.0 + k, 5, 5]])
        out = mot.step(dets)
        for tid, box in out:
            ids_seen.setdefault(tid, []).append(box)
    # Exactly two stable identities.
    assert len(ids_seen) == 2
    lens = sorted(len(v) for v in ids_seen.values())
    assert lens[0] >= 8
    # Velocity learned: last box of the fast object moved.
    fast = max(ids_seen.values(), key=lambda v: v[-1][0])
    assert fast[-1][0] > 25


def test_mot_handles_misses():
    mot = MultiObjectTracker(min_hits=2, max_misses=4)
    for k in range(6):
        mot.step(np.array([[10.0 + k, 10.0, 4, 4]]))
    # Object disappears for 2 frames, then returns: same identity.
    out_before = mot.step(np.array([[16.0, 10, 4, 4]]))
    tid_before = out_before[0][0]
    mot.step(np.zeros((0, 4)))
    mot.step(np.zeros((0, 4)))
    out_after = mot.step(np.array([[19.0, 10.0, 4, 4]]))
    assert out_after and out_after[0][0] == tid_before
