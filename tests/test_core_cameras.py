"""Camera model tests (cf. reference cpp/test/Sara/MultiViewGeometry camera
tests; model math per SURVEY.md A.11)."""

import jax.numpy as jnp
import numpy as np

from sara_tpu.core import cameras


def _roundtrip(cam, X, atol):
    uv = cam.project(X)
    ray = cam.backproject(uv)
    got = ray[..., :2] / ray[..., 2:3]
    want = X[..., :2] / X[..., 2:3]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=atol)


def test_pinhole_project_backproject(rng):
    cam = cameras.Pinhole.from_values(800.0, 805.0, 320.0, 240.0, s=0.5)
    X = jnp.asarray(rng.uniform(-0.4, 0.4, size=(64, 3)) + np.array([0, 0, 2.0]))
    _roundtrip(cam, X, 1e-9)


def test_pinhole_matrix_consistency():
    cam = cameras.Pinhole.from_values(800.0, 805.0, 320.0, 240.0, s=0.5)
    K = np.asarray(cam.matrix())
    X = jnp.array([[0.1, -0.2, 1.5]])
    uv = np.asarray(cam.project(X))
    proj = K @ np.asarray(X[0])
    np.testing.assert_allclose(uv[0], proj[:2] / proj[2], atol=1e-6)


def test_brown_conrady_roundtrip(rng):
    cam = cameras.BrownConrady.from_values(
        500.0, 505.0, 320.0, 240.0, k=(-0.22, 0.05, -0.002), p=(1e-3, -5e-4))
    X = jnp.asarray(rng.uniform(-0.3, 0.3, size=(64, 3)) + np.array([0, 0, 2.0]))
    _roundtrip(cam, X, 1e-6)


def test_brown_conrady_zero_distortion_equals_pinhole():
    cam = cameras.BrownConrady.from_values(500.0, 505.0, 320.0, 240.0)
    X = jnp.array([[0.2, -0.1, 2.0]])
    np.testing.assert_allclose(
        np.asarray(cam.project(X)), np.asarray(cam.K.project(X)), atol=1e-9)


def test_kannala_brandt_roundtrip(rng):
    cam = cameras.KannalaBrandt(
        cameras.Pinhole.from_values(400.0, 400.0, 320.0, 240.0),
        jnp.asarray([0.05, -0.01, 0.002, -0.0005], jnp.float32))
    # Wide-angle rays.
    X = jnp.asarray(rng.uniform(-1.0, 1.0, size=(64, 3)) + np.array([0, 0, 1.5]))
    uv = cam.project(X)
    ray = cam.backproject(uv)
    got = ray[..., :2] / ray[..., 2:3]
    want = X[..., :2] / X[..., 2:3]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_omnidirectional_roundtrip(rng):
    cam = cameras.Omnidirectional(
        cameras.Pinhole.from_values(500.0, 500.0, 320.0, 240.0),
        jnp.zeros(3, jnp.float32), jnp.zeros(2, jnp.float32),
        jnp.asarray(0.8, jnp.float32))
    X = jnp.asarray(rng.uniform(-0.3, 0.3, size=(32, 3)) + np.array([0, 0, 2.0]))
    uv = cam.project(X)
    ray = cam.backproject(uv)
    # backprojected ray must be collinear with X.
    Xn = X / jnp.linalg.norm(X, axis=-1, keepdims=True)
    rn = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(rn), np.asarray(Xn), atol=1e-6)


def test_undistortion_maps_identity_for_pinhole():
    cam = cameras.Pinhole.from_values(100.0, 100.0, 32.0, 24.0)
    mu, mv = cameras.undistortion_maps(cam, 48, 64)
    uu, vv = np.meshgrid(np.arange(64, dtype=np.float32), np.arange(48, dtype=np.float32))
    np.testing.assert_allclose(np.asarray(mu), uu, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mv), vv, atol=1e-4)
