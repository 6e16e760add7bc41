"""SO(3)/SE(3) round-trip and composition tests (cf. reference
cpp/test/Sara/Core rotation tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sara_tpu.core import lie


def test_so3_exp_log_roundtrip(rng):
    w = np.asarray(rng.normal(size=(32, 3)))
    # Principal branch only (|w| < pi); log wraps beyond it.
    n = np.linalg.norm(w, axis=1, keepdims=True)
    w *= np.minimum(1.0, 3.0 / np.maximum(n, 1e-9))
    w = jnp.asarray(w)
    R = lie.so3_exp(w)
    # Orthonormality.
    I = jnp.eye(3)
    err = jnp.abs(R @ jnp.swapaxes(R, -1, -2) - I).max()
    assert err < 1e-9
    w2 = lie.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-7)


def test_so3_small_angle(rng):
    w = jnp.asarray(rng.normal(size=(8, 3)) * 1e-7)
    R = lie.so3_exp(w)
    np.testing.assert_allclose(np.asarray(lie.so3_log(R)), np.asarray(w), atol=1e-9)


def test_quat_matrix_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(32, 3)))
    R = lie.so3_exp(w)
    q = lie.matrix_to_quat(R)
    R2 = lie.quat_to_matrix(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-9)


def test_quat_rotate_matches_matrix(rng):
    w = jnp.asarray(rng.normal(size=(16, 3)))
    v = jnp.asarray(rng.normal(size=(16, 3)))
    R = lie.so3_exp(w)
    q = lie.matrix_to_quat(R)
    np.testing.assert_allclose(
        np.asarray(lie.quat_rotate(q, v)),
        np.asarray(jnp.einsum("...ij,...j->...i", R, v)),
        atol=1e-8,
    )


def test_se3_exp_log_roundtrip(rng):
    xi = np.asarray(rng.normal(size=(32, 6)))
    # Keep rotation parts inside the principal branch (|w| < pi): the log
    # of exp(w) is only w itself there.
    n = np.linalg.norm(xi[:, :3], axis=1, keepdims=True)
    xi[:, :3] *= np.minimum(1.0, 3.0 / np.maximum(n, 1e-9))
    xi = jnp.asarray(xi)
    R, t = lie.se3_exp(xi)
    xi2 = lie.se3_log(R, t)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-6)


def test_se3_compose_inverse(rng):
    xa, xb = jnp.asarray(rng.normal(size=(6,))), jnp.asarray(rng.normal(size=(6,)))
    Ra, ta = lie.se3_exp(xa)
    Rb, tb = lie.se3_exp(xb)
    Rc, tc = lie.se3_compose(Ra, ta, Rb, tb)
    Ri, ti = lie.se3_inverse(Rc, tc)
    Rid, tid = lie.se3_compose(Ri, ti, Rc, tc)
    np.testing.assert_allclose(np.asarray(Rid), np.eye(3), atol=1e-9)
    np.testing.assert_allclose(np.asarray(tid), np.zeros(3), atol=1e-9)


def test_ypr(rng):
    yaw, pitch, roll = 0.3, -0.2, 0.7
    R = lie.rotation_ypr(yaw, pitch, roll)
    y, p, r = lie.matrix_to_ypr(R)
    np.testing.assert_allclose([float(y), float(p), float(r)], [yaw, pitch, roll], atol=1e-9)


def test_vmap_jit():
    f = jax.jit(jax.vmap(lie.so3_exp))
    w = jnp.ones((4, 3)) * 0.1
    assert f(w).shape == (4, 3, 3)


def test_rq_factorization(rng):
    A = jnp.asarray(rng.normal(size=(5, 3, 3)))
    R, Q = lie.rq_factorization(A)
    np.testing.assert_allclose(np.asarray(R @ Q), np.asarray(A), atol=1e-10)
    QQt = np.asarray(Q @ jnp.swapaxes(Q, -1, -2))
    np.testing.assert_allclose(QQt, np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-10)
    Rn = np.asarray(R)
    assert (np.diagonal(Rn, axis1=-2, axis2=-1) > 0).all()
    assert np.allclose(Rn[:, np.tril_indices(3, -1)[0], np.tril_indices(3, -1)[1]], 0, atol=1e-10)


def test_decompose_projection_matrix(rng):
    K = np.array([[800.0, 1.5, 320.0], [0, 790.0, 240.0], [0, 0, 1.0]])
    for s in (1.0, -2.5, 0.3):
        R = np.asarray(lie.rotation_ypr(0.4, -0.3, 1.1))
        t = rng.normal(size=3)
        P = s * (K @ np.concatenate([R, t[:, None]], axis=1))
        K2, R2, t2 = lie.decompose_projection_matrix(jnp.asarray(P))
        np.testing.assert_allclose(np.asarray(K2), K, atol=1e-6)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-8)
        np.testing.assert_allclose(np.asarray(t2), t, atol=1e-6)
        assert float(jnp.linalg.det(R2)) > 0


def test_sim3_ops_match_matrix_exponential():
    """sim3_log/compose/inverse against the 4x4 matrix exponential of the
    Sim(3) generator [[w]_x + sigma I, u; 0, 0] (scipy expm oracle)."""
    import numpy as np
    from scipy.linalg import expm

    import jax.numpy as jnp

    from sara_tpu.core import lie

    rng = np.random.default_rng(7)
    for _ in range(10):
        w = rng.normal(size=3)
        w = w / np.linalg.norm(w) * rng.uniform(0.0, 3.0)
        u = rng.normal(size=3) * 2
        sig = rng.uniform(-0.8, 0.8)
        G = np.zeros((4, 4))
        G[:3, :3] = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                              [-w[1], w[0], 0]]) + sig * np.eye(3)
        G[:3, 3] = u
        T = expm(G)
        sR = T[:3, :3]
        s = np.linalg.det(sR) ** (1.0 / 3.0)
        got = np.asarray(lie.sim3_log(jnp.asarray(sR / s),
                                      jnp.asarray(T[:3, 3]), jnp.asarray(s)))
        np.testing.assert_allclose(got, np.concatenate([w, u, [sig]]),
                                   atol=1e-6)
    # compose o inverse = identity
    R1 = np.asarray(lie.so3_exp(jnp.asarray([0.3, -0.2, 0.5])))
    Ri, ti, si = lie.sim3_inverse(jnp.asarray(R1),
                                  jnp.asarray([1.0, 2.0, 3.0]),
                                  jnp.asarray(1.7))
    Rc, tc, sc = lie.sim3_compose(jnp.asarray(R1),
                                  jnp.asarray([1.0, 2.0, 3.0]),
                                  jnp.asarray(1.7), Ri, ti, si)
    np.testing.assert_allclose(np.asarray(Rc), np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.asarray(tc), 0, atol=1e-12)
    np.testing.assert_allclose(float(sc), 1.0, atol=1e-12)
