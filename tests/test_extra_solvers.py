"""Tests: 2-pt absolute translation, vanishing points, ORSA, self-matching,
1-D clustering."""

import jax
import jax.numpy as jnp
import numpy as np

from geometry_fixtures import default_K, make_relative_motion, project
from sara_tpu.core.types import Keypoints
from sara_tpu.matching.key_proximity import self_match
from sara_tpu.mvg.extra_solvers import (
    absolute_translation, vanishing_point_from_lines, line_through)
from sara_tpu.mvg.solvers import four_point_homography
from sara_tpu.mvg.two_view import symmetric_transfer_error
from sara_tpu.ransac.orsa import orsa
from sara_tpu.utils.clustering import cluster_1d


def test_absolute_translation():
    rs = np.random.RandomState(0)
    R, t_gt = make_relative_motion()
    X = rs.uniform(-2, 2, (5, 3)) + np.array([0, 0, 8.0])
    Xc = X @ R.T + t_gt
    rays = Xc / np.linalg.norm(Xc, axis=1, keepdims=True)
    t = absolute_translation(jnp.asarray(R), jnp.asarray(X), jnp.asarray(rays))
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-8)


def test_vanishing_point():
    # Lines through a common point (40, 60).
    rs = np.random.RandomState(1)
    vp = np.array([40.0, 60.0])
    p = np.tile(vp, (8, 1))
    q = rs.uniform(0, 100, (8, 2))
    lines = np.asarray(line_through(jnp.asarray(p), jnp.asarray(q)))
    v = np.asarray(vanishing_point_from_lines(jnp.asarray(lines)))
    v2 = v[:2] / v[2]
    np.testing.assert_allclose(v2, vp, atol=1e-6)


def test_orsa_homography():
    rs = np.random.RandomState(3)
    Xp = np.concatenate([rs.uniform(-2, 2, (80, 2)), np.zeros((80, 1))], axis=1)
    Xp[:, 2] += 6.0
    K = default_K()
    R, t = make_relative_motion()
    u, _ = project(K, np.eye(3), np.zeros(3), Xp)
    v, _ = project(K, R, t, Xp)
    v += rs.normal(scale=0.3, size=v.shape)
    out = rs.choice(80, 25, replace=False)
    v[out] = rs.uniform(0, 800, (25, 2))

    def solver(sample):
        su, sv = sample
        return four_point_homography(su, sv)

    def residual(H, data):
        du, dv = data
        return symmetric_transfer_error(H, du, dv)

    res = orsa(jax.random.PRNGKey(0), (jnp.asarray(u), jnp.asarray(v)),
               jnp.ones(80, bool), solver, residual,
               sample_size=4, num_samples=300,
               alpha0=1e-4, max_threshold=20.0)
    assert bool(res.success), float(res.log_nfa)
    inl = np.asarray(res.inliers)
    true_inl = np.ones(80, bool)
    true_inl[out] = False
    assert (inl & ~true_inl).sum() <= 2
    assert inl.sum() >= 0.85 * true_inl.sum()


def test_self_match_repeated_structure(rng):
    # Two pairs of identical descriptors at distant positions + distractors.
    cap = 16
    d = rng.normal(size=(cap, 128)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d[1] = d[0]
    d[3] = d[2]
    xy = rng.uniform(0, 500, (cap, 2)).astype(np.float32)
    xy[1] = xy[0] + 200.0
    xy[3] = xy[2] + 150.0
    kp = Keypoints(xy=jnp.asarray(xy), scale=jnp.ones(cap),
                   orientation=jnp.zeros(cap), response=jnp.ones(cap),
                   descriptors=jnp.asarray(d), mask=jnp.ones(cap, bool))
    m = self_match(kp)
    ok = np.asarray(m.mask)
    j = np.asarray(m.j)
    assert ok[0] and j[0] == 1
    assert ok[1] and j[1] == 0
    assert ok[2] and j[2] == 3


def test_cluster_1d():
    vals = np.array([1.0, 1.1, 1.05, 5.0, 5.2, 9.0])
    labels, centers = cluster_1d(vals, gap=1.0)
    assert len(centers) == 3
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4]
    assert labels[5] not in (labels[0], labels[3])
