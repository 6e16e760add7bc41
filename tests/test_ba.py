"""Bundle adjustment tests on synthetic multi-view scenes (cf. reference
cpp/test/Sara/MultiViewGeometry/test_multiviewgeometry_ceres_solver_backend.cpp
and the two-view BA example, SURVEY.md §3.4)."""

import jax
import jax.numpy as jnp
import numpy as np

from geometry_fixtures import make_cube_vertices, default_K, project, rotation_distance
from sara_tpu.ba import BAProblem, BAOptions, bundle_adjust, ba_cost
from sara_tpu.core import lie


def _make_ba_problem(n_cams=4, n_pts=60, noise=0.5, perturb=True, seed=0,
                     n_bad_obs=0):
    rs = np.random.RandomState(seed)
    X = make_cube_vertices(center=(0, 0, 8.0), side=4.0, n_extra=n_pts - 8,
                          seed=seed)
    K = default_K()
    intr = np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]])

    poses_gt = []
    for c in range(n_cams):
        # Cameras on an arc looking at the cube.
        ang = 0.15 * (c - (n_cams - 1) / 2)
        R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        t = np.array([-1.5 * ang * 8.0 * 0.15, 0.0, 0.0]) + rs.normal(scale=0.02, size=3)
        poses_gt.append((R, t))

    cam_idx, pt_idx, uvs = [], [], []
    for c, (R, t) in enumerate(poses_gt):
        uv, depth = project(K, R, t, X)
        uv = uv + rs.normal(scale=noise, size=uv.shape)
        for i in range(len(X)):
            if depth[i] > 0:
                cam_idx.append(c)
                pt_idx.append(i)
                uvs.append(uv[i])
    cam_idx = np.asarray(cam_idx, np.int32)
    pt_idx = np.asarray(pt_idx, np.int32)
    uvs = np.asarray(uvs)
    if n_bad_obs:
        bad = rs.choice(len(uvs), n_bad_obs, replace=False)
        uvs[bad] += rs.uniform(30, 80, size=(n_bad_obs, 2))

    # Initial estimates: perturbed ground truth.
    poses0 = []
    for c, (R, t) in enumerate(poses_gt):
        w = lie.so3_log(jnp.asarray(R))
        w = np.asarray(w)
        if perturb and c > 0:
            w = w + rs.normal(scale=0.01, size=3)
            t = t + rs.normal(scale=0.05, size=3)
        poses0.append(np.concatenate([w, t]))
    points0 = X + (rs.normal(scale=0.05, size=X.shape) if perturb else 0.0)

    pose_fixed = np.zeros(n_cams, bool)
    pose_fixed[0] = True  # gauge

    prob = BAProblem(
        poses=jnp.asarray(np.stack(poses0)),
        points=jnp.asarray(points0),
        intrinsics=jnp.asarray(intr),
        cam_idx=jnp.asarray(cam_idx),
        pt_idx=jnp.asarray(pt_idx),
        uv=jnp.asarray(uvs),
        obs_mask=jnp.ones(len(uvs), bool),
        pose_fixed=jnp.asarray(pose_fixed),
        point_fixed=jnp.zeros(len(X), bool),
    )
    return prob, poses_gt, X


def test_ba_reduces_cost():
    prob, poses_gt, X_gt = _make_ba_problem()
    opts = BAOptions(max_iters=20)
    out, info = bundle_adjust(prob, opts)
    assert float(info["final_cost"]) < 0.5 * float(info["initial_cost"])


def test_ba_recovers_poses():
    prob, poses_gt, X_gt = _make_ba_problem(noise=0.0)
    opts = BAOptions(max_iters=30)
    out, info = bundle_adjust(prob, opts)
    # With zero observation noise, BA must drive the cost to ~0 and recover
    # the ground-truth poses.
    assert float(info["final_cost"]) < 1e-4 * float(info["initial_cost"])
    for c in range(1, prob.poses.shape[0]):
        R = np.asarray(lie.so3_exp(out.poses[c, :3]))
        assert rotation_distance(R, poses_gt[c][0]) < 1e-3
        np.testing.assert_allclose(np.asarray(out.poses[c, 3:]),
                                   poses_gt[c][1], atol=5e-3)


def test_ba_gauge_frozen():
    prob, *_ = _make_ba_problem()
    out, _ = bundle_adjust(prob, BAOptions(max_iters=5))
    np.testing.assert_array_equal(np.asarray(out.poses[0]),
                                  np.asarray(prob.poses[0]))


def test_ba_robust_to_bad_observations():
    prob, poses_gt, _ = _make_ba_problem(noise=0.3, n_bad_obs=20, seed=2)
    out, info = bundle_adjust(prob, BAOptions(max_iters=30))
    for c in range(1, prob.poses.shape[0]):
        R = np.asarray(lie.so3_exp(out.poses[c, :3]))
        assert rotation_distance(R, poses_gt[c][0]) < 5e-3


def test_ba_masked_obs_ignored():
    prob, *_ = _make_ba_problem(noise=0.0)
    # Corrupt half the observations but mask them out: result must still be
    # near-exact.
    n = prob.uv.shape[0]
    bad = np.zeros(n, bool)
    bad[: n // 2] = True
    uv = np.asarray(prob.uv).copy()
    uv[bad] += 500.0
    prob2 = prob._replace(uv=jnp.asarray(uv),
                          obs_mask=jnp.asarray(~bad))
    out, info = bundle_adjust(prob2, BAOptions(max_iters=30))
    assert float(info["final_cost"]) < 1e-4
