"""P3P absolute pose: Lambda-Twist, TPU-native.

Solves the same problem as the reference's Lambda-Twist P3P
(reference: cpp/src/DO/Sara/MultiViewGeometry/MinimalSolvers/P3PSolver.hpp:23-51,
PnP/LambdaTwist.hpp:31-620; method of Persson & Nordberg, ECCV 2018):
given 3 scene points and 3 *unit* bearing rays, recover up to 4 camera poses.

Branch-free reformulation for vmap:
  1. depth quadrics  lambda^T M_ij lambda = a_ij,
  2. one real root of the cubic det(D1 + gamma D2) = 0 (closed form),
  3. the rank-2 quadric D0 splits into two planes via symmetric ``eigh``
     (XLA-native on TPU, unlike the nonsymmetric solvers),
  4. each plane inserted into the depth quadrics -> quadratic in the plane
     parameter -> up to 4 positive-depth solutions,
  5. pose by the exact 3-point orthonormal-frame (triad) alignment.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sara_tpu.core.poly import roots_cubic_single_real, roots_quadratic


def _quadric(b, i, j):
    """M_ij with lambda^T M lambda = l_i^2 + l_j^2 - 2 b l_i l_j."""
    M = jnp.zeros((3, 3), b.dtype)
    M = M.at[i, i].set(1.0).at[j, j].set(1.0)
    M = M.at[i, j].set(-b).at[j, i].set(-b)
    return M


def _plane_basis(p: jnp.ndarray):
    """Orthonormal basis (q1, q2) of the plane p^T x = 0, branch-free."""
    ax = jnp.abs(p)
    # Unit vector least aligned with p.
    e = jnp.eye(3, dtype=p.dtype)[jnp.argmin(ax)]
    q1 = jnp.cross(p, e)
    q1 = q1 / jnp.maximum(jnp.linalg.norm(q1), 1e-12)
    q2 = jnp.cross(p, q1)
    q2 = q2 / jnp.maximum(jnp.linalg.norm(q2), 1e-12)
    return q1, q2


def _triad_pose(Xw: jnp.ndarray, Yc: jnp.ndarray):
    """Exact rigid alignment from 3 correspondences: returns (R, t) with
    Yc ~= R Xw + t. Uses orthonormal frames built from the point triangles."""

    def frame(P):
        u = P[1] - P[0]
        v = P[2] - P[0]
        e1 = u / jnp.maximum(jnp.linalg.norm(u), 1e-12)
        w = v - jnp.dot(v, e1) * e1
        e2 = w / jnp.maximum(jnp.linalg.norm(w), 1e-12)
        e3 = jnp.cross(e1, e2)
        return jnp.stack([e1, e2, e3], axis=1)  # columns

    Fx = frame(Xw)
    Fy = frame(Yc)
    R = Fy @ Fx.T
    t = Yc[0] - R @ Xw[0]
    return R, t


def p3p_lambda_twist(Xw: jnp.ndarray, rays: jnp.ndarray):
    """Up to 4 poses from 3 scene points and 3 unit bearing rays.

    Args:
      Xw: (3, 3) scene points (world frame).
      rays: (3, 3) unit bearing vectors in the camera frame (the reference
        normalizes rays before calling, CameraPoseEstimator.cpp:173-174).

    Returns:
      R: (4, 3, 3), t: (4, 3) with x_cam = R x_world + t; valid: (4,).
    """
    dtype = Xw.dtype
    a12 = jnp.sum((Xw[0] - Xw[1]) ** 2)
    a13 = jnp.sum((Xw[0] - Xw[2]) ** 2)
    a23 = jnp.sum((Xw[1] - Xw[2]) ** 2)
    b12 = jnp.dot(rays[0], rays[1])
    b13 = jnp.dot(rays[0], rays[2])
    b23 = jnp.dot(rays[1], rays[2])

    M12 = _quadric(b12, 0, 1)
    M13 = _quadric(b13, 0, 2)
    M23 = _quadric(b23, 1, 2)

    D1 = M12 * a23 - M23 * a12
    D2 = M13 * a23 - M23 * a13

    # Cubic det(D1 + g D2) = 0, coefficients by interpolation at 4 nodes.
    from sara_tpu.ops.smallmat import det3

    d0 = det3(D1)
    d1 = det3(D1 + D2)
    dm1 = det3(D1 - D2)
    d2 = det3(D1 + 2.0 * D2)
    c0 = d0
    c2 = 0.5 * (d1 + dm1) - d0
    c3 = (d2 - c0 - 4.0 * c2 - d1 + dm1) / 6.0
    c1 = 0.5 * (d1 - dm1) - c3
    gamma = roots_cubic_single_real(c3, c2, c1, c0)
    D0 = D1 + gamma * D2

    # Split the rank-2 indefinite quadric into two planes via eigh.
    evals, evecs = jnp.linalg.eigh(D0)  # ascending
    sig_n = jnp.maximum(-evals[0], 0.0)   # |negative eigenvalue|
    sig_p = jnp.maximum(evals[2], 0.0)    # positive eigenvalue
    vn = evecs[:, 0]
    vp = evecs[:, 2]
    p_a = jnp.sqrt(sig_p) * vp + jnp.sqrt(sig_n) * vn
    p_b = jnp.sqrt(sig_p) * vp - jnp.sqrt(sig_n) * vn

    def solve_plane(p):
        q1, q2 = _plane_basis(p)
        # lambda = alpha q1 + beta q2; quadratics A a^2 + B ab + C b^2.
        def qform(M):
            return (q1 @ M @ q1, 2.0 * (q1 @ M @ q2), q2 @ M @ q2)

        A1, B1, C1 = qform(M12)
        A2, B2, C2 = qform(M23)
        r = a12 / jnp.maximum(a23, 1e-12)
        # (A1 - r A2) t^2 + (B1 - r B2) t + (C1 - r C2) = 0, t = alpha/beta.
        ts, tvalid = roots_quadratic(A1 - r * A2, B1 - r * B2, C1 - r * C2)

        def depths(t, ok):
            denom = A2 * t * t + B2 * t + C2
            beta2 = a23 / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
            good = ok & (beta2 > 0)
            beta = jnp.sqrt(jnp.maximum(beta2, 0.0))
            lam = beta * (t * q1 + q2)
            # Depths must be positive; flip the overall sign if needed.
            lam = lam * jnp.sign(jnp.sum(lam) + 1e-12)
            good = good & jnp.all(lam > 0)
            return lam, good

        lam0, g0 = depths(ts[..., 0], tvalid[..., 0])
        lam1, g1 = depths(ts[..., 1], tvalid[..., 1])
        return jnp.stack([lam0, lam1]), jnp.stack([g0, g1])

    lam_a, good_a = solve_plane(p_a)
    lam_b, good_b = solve_plane(p_b)
    lam = jnp.concatenate([lam_a, lam_b], axis=0)    # (4, 3)
    good = jnp.concatenate([good_a, good_b], axis=0)  # (4,)

    def pose_from_depths(l):
        Yc = l[:, None] * rays  # camera-frame points
        return _triad_pose(Xw, Yc)

    R, t = jax.vmap(pose_from_depths)(lam)

    # Verify reprojection of the minimal sample itself (guards eigh noise).
    Yc = jnp.einsum("kij,nj->kni", R, Xw) + t[:, None, :]
    Ycn = Yc / jnp.maximum(jnp.linalg.norm(Yc, axis=-1, keepdims=True), 1e-12)
    align = jnp.sum(Ycn * rays[None], axis=-1)  # cosines
    good = good & jnp.all(align > 0.9999, axis=-1)
    return R, t, good
