"""Minimal solver tests on exact synthetic geometry (cf. reference
cpp/test/Sara/MultiViewGeometry/test_multiviewgeometry_*.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from geometry_fixtures import (
    two_view_scene, essential_from_motion, rotation_distance,
    translation_angle, make_cube_vertices, default_K, project,
    make_relative_motion)
from sara_tpu.mvg import (
    eight_point_fundamental, seven_point_fundamental, four_point_homography,
    five_point_essential, p3p_lambda_twist, triangulate_linear,
    essential_to_motions, two_view_geometry, sampson_epipolar_distance,
    hartley_normalize,
)


def _epipolar_residual(F, u, v):
    uh = np.concatenate([u, np.ones((len(u), 1))], axis=1)
    vh = np.concatenate([v, np.ones((len(v), 1))], axis=1)
    return np.abs(np.einsum("ni,ij,nj->n", vh, np.asarray(F), uh))


def test_eight_point():
    # NOTE: the 8 cube corners are a degenerate configuration (2-D null
    # space), so sample from the random points (fixture rows 8:16).
    sc = two_view_scene()
    un, vn, Tu, Tv = hartley_normalize(jnp.asarray(sc["un"][8:16]),
                                       jnp.asarray(sc["vn"][8:16]))
    Fn, valid = eight_point_fundamental(un, vn)
    F = np.asarray(Tv).T @ np.asarray(Fn[0]) @ np.asarray(Tu)
    F /= np.linalg.norm(F)
    r = _epipolar_residual(F, sc["un"], sc["vn"])
    assert r.max() < 1e-8


def test_seven_point():
    sc = two_view_scene()
    un, vn, Tu, Tv = hartley_normalize(jnp.asarray(sc["un"][8:15]),
                                       jnp.asarray(sc["vn"][8:15]))
    Fn, valid = seven_point_fundamental(un, vn)
    ok = False
    for i in range(3):
        if not bool(valid[i]):
            continue
        F = np.asarray(Tv).T @ np.asarray(Fn[i]) @ np.asarray(Tu)
        F /= np.linalg.norm(F)
        if _epipolar_residual(F, sc["un"], sc["vn"]).max() < 1e-6:
            ok = True
    assert ok


def test_four_point_homography():
    # Planar scene -> exact homography.
    rs = np.random.RandomState(3)
    Xp = np.concatenate([rs.uniform(-1, 1, (12, 2)), np.zeros((12, 1))], axis=1)
    Xp[:, 2] += 5.0
    K = default_K()
    R, t = make_relative_motion()
    u, _ = project(K, np.eye(3), np.zeros(3), Xp)
    v, _ = project(K, R, t, Xp)
    H, valid = four_point_homography(jnp.asarray(u[:4]), jnp.asarray(v[:4]))
    Hn = np.asarray(H[0])
    uh = np.concatenate([u, np.ones((len(u), 1))], axis=1)
    p = uh @ Hn.T
    p = p[:, :2] / p[:, 2:]
    np.testing.assert_allclose(p, v, atol=1e-5)


def test_five_point_essential_exact():
    sc = two_view_scene()
    E_gt = sc["E"]
    Es, valid = five_point_essential(jnp.asarray(sc["un"][8:13]),
                                     jnp.asarray(sc["vn"][8:13]))
    Es, valid = np.asarray(Es), np.asarray(valid)
    assert valid.any(), "no valid essential matrix found"
    best = np.inf
    for i in range(len(Es)):
        if not valid[i]:
            continue
        E = Es[i] / np.linalg.norm(Es[i])
        d = min(np.abs(E - E_gt).max(), np.abs(E + E_gt).max())
        best = min(best, d)
    assert best < 1e-4, f"best essential error {best}"


def test_five_point_on_many_instances():
    failures = 0
    for seed in range(10):
        sc = two_view_scene(seed=seed)
        Es, valid = five_point_essential(jnp.asarray(sc["un"][8:13]),
                                         jnp.asarray(sc["vn"][8:13]))
        Es, valid = np.asarray(Es), np.asarray(valid)
        ok = False
        for i in range(len(Es)):
            if not valid[i]:
                continue
            r = _epipolar_residual(Es[i], sc["un"][8:13], sc["vn"][8:13])
            # residual on the *sample* must vanish for a true solution
            if r.max() < 1e-6:
                ok = True
        failures += 0 if ok else 1
    assert failures <= 1, f"{failures}/10 instances failed"


def test_essential_to_motions_recovers_truth():
    sc = two_view_scene()
    R4, t4 = essential_to_motions(jnp.asarray(sc["E"]))
    dists = [rotation_distance(np.asarray(R4[i]), sc["R"]) for i in range(4)]
    assert min(dists) < 1e-6
    tdists = [translation_angle(np.asarray(t4[i]), sc["t"]) for i in range(4)]
    assert min(tdists) < 1e-6


def test_two_view_geometry_cheirality():
    sc = two_view_scene()
    ray1 = np.concatenate([sc["un"], np.ones((len(sc["un"]), 1))], axis=1)
    ray2 = np.concatenate([sc["vn"], np.ones((len(sc["vn"]), 1))], axis=1)
    R, t, X, cheiral, count = two_view_geometry(
        jnp.asarray(sc["E"]), jnp.asarray(ray1), jnp.asarray(ray2))
    assert rotation_distance(np.asarray(R), sc["R"]) < 1e-6
    assert translation_angle(np.asarray(t), sc["t"]) < 1e-6
    assert int(count) == len(ray1)
    # Triangulated structure matches ground truth up to the scale |t|.
    scale = np.linalg.norm(sc["t"])
    np.testing.assert_allclose(np.asarray(X) * scale, sc["X"], atol=1e-5)


def test_triangulation_exact():
    sc = two_view_scene()
    ray1 = np.concatenate([sc["un"], np.ones((len(sc["un"]), 1))], axis=1)
    ray2 = np.concatenate([sc["vn"], np.ones((len(sc["vn"]), 1))], axis=1)
    # Use ground-truth motion with unit-norm translation; compare up to scale.
    s = np.linalg.norm(sc["t"])
    X, d1, d2 = triangulate_linear(jnp.asarray(sc["R"]), jnp.asarray(sc["t"] / s),
                                   jnp.asarray(ray1), jnp.asarray(ray2))
    np.testing.assert_allclose(np.asarray(X) * s, sc["X"], atol=1e-6)
    assert np.all(np.asarray(d1) > 0) and np.all(np.asarray(d2) > 0)


def test_p3p_exact():
    sc = two_view_scene()
    X = sc["X"][:3]
    R_gt, t_gt = sc["R"], sc["t"]
    Xc = X @ R_gt.T + t_gt
    rays = Xc / np.linalg.norm(Xc, axis=1, keepdims=True)
    R, t, valid = p3p_lambda_twist(jnp.asarray(X), jnp.asarray(rays))
    R, t, valid = np.asarray(R), np.asarray(t), np.asarray(valid)
    assert valid.any()
    best = min(rotation_distance(R[i], R_gt) + np.linalg.norm(t[i] - t_gt)
               for i in range(4) if valid[i])
    assert best < 1e-5, f"best pose error {best}"


def test_p3p_many_instances():
    fails = 0
    for seed in range(20):
        rs = np.random.RandomState(seed)
        X = rs.uniform(-2, 2, (3, 3)) + np.array([0, 0, 6.0])
        R_gt, t_gt = make_relative_motion(*rs.uniform(-0.5, 0.5, 3),
                                          t=rs.uniform(-1, 1, 3))
        Xc = X @ R_gt.T + t_gt
        if (Xc[:, 2] <= 0.1).any():
            continue
        rays = Xc / np.linalg.norm(Xc, axis=1, keepdims=True)
        R, t, valid = p3p_lambda_twist(jnp.asarray(X), jnp.asarray(rays))
        R, t, valid = np.asarray(R), np.asarray(t), np.asarray(valid)
        ok = valid.any() and min(
            rotation_distance(R[i], R_gt) for i in range(4) if valid[i]) < 1e-4
        fails += 0 if ok else 1
    assert fails <= 1, f"{fails} P3P failures"


def test_sampson_distance_zero_for_inliers():
    sc = two_view_scene()
    d = sampson_epipolar_distance(jnp.asarray(sc["E"]),
                                  jnp.asarray(sc["un"]), jnp.asarray(sc["vn"]))
    assert float(jnp.max(d)) < 1e-8
