"""SO(3)/SE(3) operations: quaternions, angle-axis (exp/log), yaw-pitch-roll.

TPU-native replacement for the reference's rotation helpers
(reference: cpp/src/DO/Sara/Core/Math/Rotation.hpp,
MultiViewGeometry/Geometry/QuaternionBasedPose.hpp) and the angle-axis
parameterization used by its Ceres bundle adjuster
(SfM/BuildingBlocks/BundleAdjuster.cpp).

All functions are pure, broadcast over leading batch dimensions, and are safe
under ``jit``/``vmap``/``grad`` (small-angle branches handled with Taylor
expansions rather than data-dependent control flow).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z) convention.
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by unit quaternion(s) q."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> 3x3 rotation matrix (batched)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix -> unit quaternion (w,x,y,z), branch-free (batched).

    Uses the standard four-candidate construction and selects the candidate
    with the largest denominator via ``where`` so it vmaps cleanly.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions (unnormalized), one per dominant component.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11], axis=-1)

    # Pick by largest leading term (most numerically stable).
    lead = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                      1.0 + m11 - m00 - m22, 1.0 + m22 - m00 - m11], axis=-1)
    best = jnp.argmax(lead, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32),
                            axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # Canonicalize sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


# ---------------------------------------------------------------------------
# SO(3) exp/log (angle-axis), the BA parameterization.
# ---------------------------------------------------------------------------

def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Angle-axis (3,) -> rotation matrix (3,3), Rodrigues with Taylor guard."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = skew(w)
    KK = K @ K
    # sin(t)/t and (1-cos t)/t^2 with small-angle Taylor fallback.
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + A * K + B * KK


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> angle-axis, via the quaternion log (robust near pi)."""
    q = matrix_to_quat(R)
    w = q[..., 0:1]
    v = q[..., 1:]
    vnorm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # angle = 2*atan2(|v|, w); axis = v/|v|
    angle = 2.0 * jnp.arctan2(vnorm, w)
    scale = jnp.where(vnorm < _EPS, 2.0 / jnp.clip(w, _EPS, None), angle / jnp.clip(vnorm, _EPS, None))
    return v * scale


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """(...,3) -> (...,3,3) cross-product matrix [w]x."""
    x, y, z = jnp.moveaxis(w, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(w.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# SE(3): (R | t) pairs. Represented as tuples of arrays; world-to-camera by
# convention, matching the reference's pose usage (x_cam = R x_world + t).
# ---------------------------------------------------------------------------

def se3_exp(xi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Twist (..., 6) = (w, v) -> (R, t) with the exact V matrix."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = skew(w)
    KK = K @ K
    small = theta2 < 1e-8
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (theta2 * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    V = eye + B * K + C * KK
    t = jnp.einsum("...ij,...j->...i", V, v)
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R, t) -> twist (..., 6)."""
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = skew(w)
    KK = K @ K
    small = theta2 < 1e-8
    # V^{-1} = I - K/2 + (1/theta^2)(1 - A/(2B)) K^2
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    coef = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                     (1.0 - A / (2.0 * B)) / theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), K.shape)
    Vinv = eye - 0.5 * K + coef * KK
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([w, v], axis=-1)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra,ta) o (Rb,tb): apply b first, then a."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_apply(R, t, X):
    return jnp.einsum("...ij,...j->...i", R, X) + t


# ---------------------------------------------------------------------------
# Sim(3): x -> s R x + t. The similarity group is what monocular loop
# closure must optimize over — SE(3) pose graphs cannot express the SCALE
# drift a monocular odometry chain accumulates (Strasdat et al., "Scale
# Drift-Aware Large Scale Monocular SLAM", RSS 2010). No reference
# counterpart (the reference has no pose-graph backend at all).
# ---------------------------------------------------------------------------

def sim3_compose(Ra, ta, sa, Rb, tb, sb):
    """(Ra,ta,sa) o (Rb,tb,sb): apply b first, then a."""
    return (Ra @ Rb,
            sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta,
            sa * sb)


def sim3_inverse(R, t, s):
    Rt = jnp.swapaxes(R, -1, -2)
    sinv = 1.0 / s
    return Rt, -sinv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t), sinv


def _inv3(M):
    """Closed-form 3x3 inverse (adjugate) — batched tiny `linalg.solve`
    lowers to the padded LU custom call that is a measured TPU trap
    (NOTES.md round 2); the adjugate is three cross products."""
    a, b, c = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    r0, r1, r2 = jnp.cross(b, c), jnp.cross(c, a), jnp.cross(a, b)
    det = jnp.sum(a * r0, axis=-1)[..., None, None]
    return jnp.stack([r0, r1, r2], axis=-1) / det


def _sim3_W(w, sigma, terms: int = 18):
    """W(w, sigma) = sum_k M^k / (k+1)!  with  M = [w]_x + sigma I — the
    left Jacobian that maps the translational tangent to the group
    translation (t = W u). The truncated series is exact to ~1e-8 for
    |w| <= pi and |sigma| <= 1 and stays autodiff-friendly (no
    theta-branch case analysis)."""
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype),
                           w.shape[:-1] + (3, 3))
    M = skew(w) + sigma[..., None, None] * eye
    W = eye
    term = eye
    for k in range(1, terms):
        term = term @ M / (k + 1.0)
        W = W + term
    return W


def sim3_log(R, t, s):
    """(R, t, s) -> (..., 7) tangent [w(3), u(3), sigma(1)]."""
    w = so3_log(R)
    sigma = jnp.log(s)
    u = jnp.einsum("...ij,...j->...i", _inv3(_sim3_W(w, sigma)), t)
    return jnp.concatenate([w, u, sigma[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Yaw-pitch-roll (reference: Core/Math/Rotation.hpp `rotation(psi,theta,phi)`
# = Rz(psi) Ry(theta) Rx(phi)).
# ---------------------------------------------------------------------------

def rotation_ypr(psi, theta, phi) -> jnp.ndarray:
    """Rz(psi) @ Ry(theta) @ Rx(phi)."""
    return rotation_z(psi) @ rotation_y(theta) @ rotation_x(phi)


def rotation_x(a) -> jnp.ndarray:
    a = jnp.asarray(a)
    c, s = jnp.cos(a), jnp.sin(a)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    m = jnp.stack([one, zero, zero, zero, c, -s, zero, s, c], axis=-1)
    return m.reshape(a.shape + (3, 3))


def rotation_y(a) -> jnp.ndarray:
    a = jnp.asarray(a)
    c, s = jnp.cos(a), jnp.sin(a)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    m = jnp.stack([c, zero, s, zero, one, zero, -s, zero, c], axis=-1)
    return m.reshape(a.shape + (3, 3))


def rotation_z(a) -> jnp.ndarray:
    a = jnp.asarray(a)
    c, s = jnp.cos(a), jnp.sin(a)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    m = jnp.stack([c, -s, zero, s, c, zero, zero, zero, one], axis=-1)
    return m.reshape(a.shape + (3, 3))


def matrix_to_ypr(R: jnp.ndarray):
    """Extract (yaw, pitch, roll) with R = Rz(yaw) Ry(pitch) Rx(roll)."""
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return yaw, pitch, roll


# ---------------------------------------------------------------------------
# RQ factorization + projection-matrix decomposition
# (reference: Core/Math/RQFactorization.hpp — the standard K, R extraction
# from a 3x4 camera projection matrix, Hartley-Zisserman §6.2.4).
# ---------------------------------------------------------------------------

def rq_factorization(A: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Factor A = R @ Q with R upper triangular (positive diagonal) and Q
    orthogonal, via the flipped-QR identity. Batched over leading dims.
    """
    n = A.shape[-1]
    flip = jnp.eye(n, dtype=A.dtype)[::-1]
    # QR of (flip A).T gives A = (flip R0.T flip) (flip Q0.T): upper-tri x orth.
    q0, r0 = jnp.linalg.qr(jnp.swapaxes(flip @ A, -1, -2))
    R = flip @ jnp.swapaxes(r0, -1, -2) @ flip
    Q = flip @ jnp.swapaxes(q0, -1, -2)
    # Normalize signs so diag(R) > 0 (absorb the sign flips into Q).
    d = jnp.diagonal(R, axis1=-2, axis2=-1)
    s = jnp.where(d < 0, -1.0, 1.0).astype(A.dtype)
    R = R * s[..., None, :]
    Q = Q * s[..., :, None]
    return R, Q


def decompose_projection_matrix(
    P: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Split a 3x4 projection P ~ K [R | t] into (K, R, t).

    K is upper triangular with positive diagonal and K[2,2] == 1; R is a
    proper rotation (det +1). Batched over leading dims.
    """
    # P is projective: fix the overall sign so det(M) > 0, which (with the
    # diag(K) > 0 convention, det(K) > 0) forces det(Q) = +1 in the RQ split.
    M = P[..., :, :3]
    sign = jnp.where(jnp.linalg.det(M) < 0, -1.0, 1.0).astype(P.dtype)
    P = P * sign[..., None, None]
    K, R = rq_factorization(P[..., :, :3])
    t = jnp.linalg.solve(K, P[..., :, 3])
    K = K / K[..., 2:3, 2:3]
    return K, R, t
