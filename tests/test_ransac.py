"""RANSAC estimator tests with outliers (cf. reference
cpp/test/Sara/RANSAC/test_ransac_*.cpp — synthetic data + noise/outliers,
assert ground-truth recovery)."""

import jax
import jax.numpy as jnp
import numpy as np

from geometry_fixtures import (
    two_view_scene, default_K, make_relative_motion, project,
    rotation_distance, translation_angle)
from sara_tpu.ransac import (
    estimate_homography, estimate_fundamental, estimate_relative_pose,
    estimate_absolute_pose, ransac_num_samples)


def test_ransac_num_samples():
    # Standard values: 50% inliers, sample size 4, 99% confidence -> 72.
    assert ransac_num_samples(0.5, 4, 0.99) == 72


def test_homography_with_outliers():
    rs = np.random.RandomState(1)
    Xp = np.concatenate([rs.uniform(-2, 2, (100, 2)), np.zeros((100, 1))], axis=1)
    Xp[:, 2] += 6.0
    K = default_K()
    R, t = make_relative_motion()
    u, _ = project(K, np.eye(3), np.zeros(3), Xp)
    v, _ = project(K, R, t, Xp)
    v += rs.normal(scale=0.3, size=v.shape)
    out = rs.choice(100, 30, replace=False)
    v[out] = rs.uniform(0, 800, (30, 2))
    mask = jnp.ones(100, bool)
    res = estimate_homography(jax.random.PRNGKey(0), jnp.asarray(u),
                              jnp.asarray(v), mask, threshold=2.0,
                              num_samples=500)
    assert bool(res.success)
    inl = np.asarray(res.inliers)
    # All true inliers recovered, no outliers included.
    true_inl = np.ones(100, bool)
    true_inl[out] = False
    assert (inl & ~true_inl).sum() == 0
    assert inl.sum() >= 0.9 * true_inl.sum()


def test_fundamental_with_outliers():
    sc = two_view_scene(n_points=150, noise=0.0, n_outliers=40, seed=5)
    mask = jnp.ones(len(sc["u"]), bool)
    res = estimate_fundamental(jax.random.PRNGKey(1), jnp.asarray(sc["un"]),
                               jnp.asarray(sc["vn"]), mask,
                               threshold=2.0 / 800.0, num_samples=500)
    assert bool(res.success)
    inl = np.asarray(res.inliers)
    true_inl = np.ones(len(inl), bool)
    true_inl[sc["outliers"]] = False
    assert (inl & ~true_inl).sum() <= 2
    assert inl.sum() >= 0.9 * true_inl.sum()


def test_relative_pose_with_outliers():
    sc = two_view_scene(n_points=200, noise=0.2, n_outliers=50, seed=7)
    mask = jnp.ones(len(sc["u"]), bool)
    res, R, t = estimate_relative_pose(
        jax.random.PRNGKey(2), jnp.asarray(sc["u"]), jnp.asarray(sc["v"]),
        mask, jnp.asarray(sc["K"]), jnp.asarray(sc["K"]),
        threshold_px=4.0, num_samples=300, min_inliers=100)
    assert bool(res.success), f"only {int(res.num_inliers)} inliers"
    assert rotation_distance(np.asarray(R), sc["R"]) < 0.01
    assert translation_angle(np.asarray(t), sc["t"]) < 0.02


def test_absolute_pose_with_outliers():
    rs = np.random.RandomState(11)
    X = rs.uniform(-3, 3, (120, 3)) + np.array([0, 0, 8.0])
    K = default_K()
    R_gt, t_gt = make_relative_motion(0.2, -0.1, 0.15, t=(0.5, -0.2, 0.3))
    uv, depth = project(K, R_gt, t_gt, X)
    uv += rs.normal(scale=0.3, size=uv.shape)
    out = rs.choice(120, 30, replace=False)
    uv[out] = rs.uniform(0, 768, (30, 2))
    # Bearing rays from observed pixels (camera frame).
    Ki = np.linalg.inv(K)
    ph = np.concatenate([uv, np.ones((120, 1))], axis=1) @ Ki.T
    rays = ph / np.linalg.norm(ph, axis=1, keepdims=True)
    res, R, t = estimate_absolute_pose(
        jax.random.PRNGKey(3), jnp.asarray(X), jnp.asarray(rays),
        jnp.asarray(uv), jnp.asarray(K), jnp.ones(120, bool),
        threshold_px=5.0, num_samples=500, min_inliers=50)
    assert bool(res.success), f"only {int(res.num_inliers)} inliers"
    assert rotation_distance(np.asarray(R), R_gt) < 0.01
    assert np.linalg.norm(np.asarray(t) - t_gt) < 0.05
