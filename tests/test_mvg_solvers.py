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


@pytest.mark.slow
def test_fivepoint_monte_carlo_recovery():
    """Monte-Carlo root-recovery rate vs the CPU generalized-eigenvalue
    oracle on the same pencil (scripts/mc_fivepoint.py; VERDICT round-1
    item 7). Generic and near-planar problems must recover >= 99% / 97%
    of the oracle's essential matrices. (Near-zero-baseline problems are
    excluded: with ||t|| ~ 1e-3 the epipolar constraint barely determines
    E and per-matrix recovery is not meaningful — any near-solution still
    carries the correct rotation.)"""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "scripts"))
    import jax
    from mc_fivepoint import make_problem, oracle_solutions
    from sara_tpu.mvg.fivepoint import five_point_essential

    solver = jax.jit(jax.vmap(five_point_essential))
    rs = np.random.RandomState(42)
    stats = {"generic": [0, 0], "planar": [0, 0]}
    probs, kinds = [], []
    for i in range(256):
        planar = i % 3 == 0
        probs.append(make_problem(rs, near_planar=planar))
        kinds.append("planar" if planar else "generic")
    U = jnp.asarray(np.stack([p[0] for p in probs]))
    V = jnp.asarray(np.stack([p[1] for p in probs]))
    Es, valids = solver(U, V)
    Es, valids = np.asarray(Es), np.asarray(valids)
    for k, (u, v, _) in enumerate(probs):
        ours = [Es[k][i] / max(np.linalg.norm(Es[k][i]), 1e-12)
                for i in range(Es.shape[1]) if valids[k][i]]
        for E in oracle_solutions(u, v):
            s = stats[kinds[k]]
            s[0] += 1
            s[1] += any(min(np.linalg.norm(E - F), np.linalg.norm(E + F))
                        < 1e-3 for F in ours)
    gen = stats["generic"]
    pla = stats["planar"]
    assert gen[1] / gen[0] >= 0.99, f"generic recovery {gen[1]}/{gen[0]}"
    assert pla[1] / pla[0] >= 0.97, f"planar recovery {pla[1]}/{pla[0]}"


def test_dominant_plane_degeneracy_detection():
    """Plane-degenerate scenes yield a high dominant-plane ratio; generic
    3-D scenes a low one (reference: EpipolarDegeneracy.hpp DEGENSAC)."""
    from sara_tpu.mvg.degeneracy import dominant_plane_ratio

    rs = np.random.RandomState(5)
    ang = 0.2
    R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]])
    t = np.array([1.0, 0.2, 0.1])

    def project_pair(X):
        u = X[:, :2] / X[:, 2:]
        Xb = X @ R.T + t
        v = Xb[:, :2] / Xb[:, 2:]
        return u, v

    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R

    # Planar scene: all points on one plane.
    n_vec = np.array([0.1, 0.3, 1.0])
    Xp = rs.uniform(-2, 2, (60, 3)) + np.array([0, 0, 6.0])
    d = 6.0
    Xp = Xp * (d / (Xp @ n_vec))[:, None]  # project onto plane n.X = d
    up, vp = project_pair(Xp)
    # Generic scene.
    Xg = rs.uniform(-2, 2, (60, 3)) + np.array([0, 0, 6.0])
    ug, vg = project_pair(Xg)

    mask = jnp.ones(60, bool)
    # Normalized coordinates: E acts directly; threshold in normalized
    # units (~1e-2 rad of transfer error).
    r_planar = float(dominant_plane_ratio(
        jnp.asarray(E), jnp.asarray(up), jnp.asarray(vp), mask,
        threshold=0.01))
    r_generic = float(dominant_plane_ratio(
        jnp.asarray(E), jnp.asarray(ug), jnp.asarray(vg), mask,
        threshold=0.01))
    assert r_planar > 0.9, f"planar ratio {r_planar}"
    assert r_generic < 0.6, f"generic ratio {r_generic}"
