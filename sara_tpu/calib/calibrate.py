"""Pinhole camera calibration from planar (chessboard) views.

Rebuild of the reference calibration tool
(reference: cpp/tools/Calibration/calibrate_pinhole_camera.cpp:36-384 —
per-view pose init then one global Ceres problem, SPARSE_SCHUR, with
SubsetManifold freezing selected intrinsics).

TPU-first design: Zhang's closed-form intrinsics initialization from
homographies, pose init per view from the homography, then one jitted
Levenberg-Marquardt program over [fx, fy, cx, cy, k1, k2, p1, p2] + all
view poses, with autodiff Jacobians and a dense normal-equation solve
(calibration problems are small: #params = 8 + 6V).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from sara_tpu.core import lie


def _homography(obj_xy: np.ndarray, img_xy: np.ndarray) -> np.ndarray:
    """DLT homography object plane (z=0) -> image, host-side f64."""
    n = len(obj_xy)
    A = []
    for (X, Y), (u, v) in zip(obj_xy, img_xy):
        A.append([X, Y, 1, 0, 0, 0, -u * X, -u * Y, -u])
        A.append([0, 0, 0, X, Y, 1, -v * X, -v * Y, -v])
    _, _, Vt = np.linalg.svd(np.asarray(A))
    H = Vt[-1].reshape(3, 3)
    return H / H[2, 2]


def zhang_init_intrinsics(obj_points: np.ndarray, img_points: np.ndarray):
    """Closed-form K from >= 3 planar views (Zhang 2000).

    Args:
      obj_points: (V, N, 2) planar model points (z = 0).
      img_points: (V, N, 2) detected pixels.

    Returns (K (3,3), homographies (V, 3, 3)).
    """
    V = len(obj_points)
    Hs = [_homography(obj_points[v], img_points[v]) for v in range(V)]

    def vij(H, i, j):
        return np.array([
            H[0, i] * H[0, j],
            H[0, i] * H[1, j] + H[1, i] * H[0, j],
            H[1, i] * H[1, j],
            H[2, i] * H[0, j] + H[0, i] * H[2, j],
            H[2, i] * H[1, j] + H[1, i] * H[2, j],
            H[2, i] * H[2, j],
        ])

    rows = []
    for H in Hs:
        rows.append(vij(H, 0, 1))
        rows.append(vij(H, 0, 0) - vij(H, 1, 1))
    A = np.stack(rows)
    _, _, Vt = np.linalg.svd(A)
    b = Vt[-1]
    B11, B12, B22, B13, B23, B33 = b
    v0 = (B12 * B13 - B11 * B23) / (B11 * B22 - B12 ** 2)
    lam = B33 - (B13 ** 2 + v0 * (B12 * B13 - B11 * B23)) / B11
    alpha = np.sqrt(abs(lam / B11))
    beta = np.sqrt(abs(lam * B11 / (B11 * B22 - B12 ** 2)))
    gamma = -B12 * alpha ** 2 * beta / lam
    u0 = gamma * v0 / beta - B13 * alpha ** 2 / lam
    K = np.array([[alpha, gamma, u0], [0, beta, v0], [0, 0, 1.0]])
    return K, np.stack(Hs)


def homography_pose(K: np.ndarray, H: np.ndarray):
    """Pose (R, t) of a planar view from its homography: H ~ K [r1 r2 t]."""
    M = np.linalg.inv(K) @ H
    s = 1.0 / np.linalg.norm(M[:, 0])
    # Cheirality: t_z > 0 for a visible plane.
    if M[2, 2] * s < 0:
        s = -s
    r1 = s * M[:, 0]
    r2 = s * M[:, 1]
    t = s * M[:, 2]
    r3 = np.cross(r1, r2)
    R = np.stack([r1, r2, r3], axis=1)
    U, _, Vt = np.linalg.svd(R)
    R = U @ Vt
    if np.linalg.det(R) < 0:
        R = U @ np.diag([1, 1, -1.0]) @ Vt
    return R, t


def _project_bc(intr, pose6, Xw):
    """Project with Brown-Conrady distortion [fx fy cx cy k1 k2 p1 p2]."""
    R = lie.so3_exp(pose6[:3])
    Xc = R @ Xw + pose6[3:]
    x = Xc[0] / Xc[2]
    y = Xc[1] / Xc[2]
    r2 = x * x + y * y
    radial = 1.0 + intr[4] * r2 + intr[5] * r2 * r2
    p1, p2 = intr[6], intr[7]
    xd = x * radial + r2 * p1 + 2 * x * (x * p1 + y * p2)
    yd = y * radial + r2 * p2 + 2 * y * (x * p1 + y * p2)
    return jnp.stack([intr[0] * xd + intr[2], intr[1] * yd + intr[3]])


@functools.partial(jax.jit, static_argnames=("iters", "fix_distortion"))
def _refine(intr0, poses0, obj_xyz, img_xy, iters: int = 30,
            fix_distortion: bool = False):
    """Joint LM over intrinsics + poses. obj_xyz: (V, N, 3); img: (V, N, 2)."""
    V, N, _ = obj_xyz.shape

    def unpack(theta):
        return theta[:8], theta[8:].reshape(V, 6)

    def residuals(theta):
        intr, poses = unpack(theta)
        def view(p6, Xs, uvs):
            pred = jax.vmap(lambda X: _project_bc(intr, p6, X))(Xs)
            return (pred - uvs).reshape(-1)
        return jax.vmap(view)(poses, obj_xyz, img_xy).reshape(-1)

    theta0 = jnp.concatenate([intr0, poses0.reshape(-1)])
    n_par = theta0.shape[0]
    free = jnp.ones((n_par,), bool)
    if fix_distortion:
        free = free.at[4:8].set(False)

    def step(carry, _):
        theta, lam, cost = carry
        r = residuals(theta)
        J = jax.jacfwd(residuals)(theta)
        J = J * free[None, :]
        H = J.T @ J
        g = -J.T @ r
        dtheta = jnp.linalg.solve(
            H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(n_par), g)
        cand = theta + jnp.where(free, dtheta, 0.0)
        new_cost = jnp.sum(residuals(cand) ** 2)
        accept = new_cost < cost
        theta2 = jnp.where(accept, cand, theta)
        lam2 = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-10),
                         jnp.minimum(lam * 4.0, 1e8))
        return (theta2, lam2, jnp.where(accept, new_cost, cost)), None

    cost0 = jnp.sum(residuals(theta0) ** 2)
    (theta, _, cost), _ = jax.lax.scan(
        step, (theta0, jnp.asarray(1e-3, theta0.dtype), cost0),
        None, length=iters)
    intr, poses = unpack(theta)
    rms = jnp.sqrt(cost / (V * N))
    return intr, poses, rms


def _project_omni(intr, pose6, Xw):
    """Unified-mirror projection [fx fy cx cy k1 k2 xi] for omnidirectional
    calibration (reference: cpp/tools/Calibration/
    calibrate_omnidirectional_cameras.cpp; model per v2/OmnidirectionalCamera)."""
    R = lie.so3_exp(pose6[:3])
    Xc = R @ Xw + pose6[3:]
    Xs = Xc / jnp.linalg.norm(Xc)
    denom = Xs[2] + intr[6]
    x = Xs[0] / denom
    y = Xs[1] / denom
    r2 = x * x + y * y
    radial = 1.0 + intr[4] * r2 + intr[5] * r2 * r2
    return jnp.stack([intr[0] * x * radial + intr[2],
                      intr[1] * y * radial + intr[3]])


@functools.partial(jax.jit, static_argnames=("iters",))
def _refine_omni(intr0, poses0, obj_xyz, img_xy, iters: int = 40):
    """Joint LM over omnidirectional intrinsics [fx fy cx cy k1 k2 xi] and
    view poses."""
    V, N, _ = obj_xyz.shape

    def unpack(theta):
        return theta[:7], theta[7:].reshape(V, 6)

    def residuals(theta):
        intr, poses = unpack(theta)

        def view(p6, Xs, uvs):
            pred = jax.vmap(lambda X: _project_omni(intr, p6, X))(Xs)
            return (pred - uvs).reshape(-1)

        return jax.vmap(view)(poses, obj_xyz, img_xy).reshape(-1)

    theta0 = jnp.concatenate([intr0, poses0.reshape(-1)])
    n_par = theta0.shape[0]

    def step(carry, _):
        theta, lam, cost = carry
        r = residuals(theta)
        J = jax.jacfwd(residuals)(theta)
        H = J.T @ J
        g = -J.T @ r
        dtheta = jnp.linalg.solve(
            H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(n_par), g)
        cand = theta + dtheta
        new_cost = jnp.sum(residuals(cand) ** 2)
        accept = new_cost < cost
        theta2 = jnp.where(accept, cand, theta)
        lam2 = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-10),
                         jnp.minimum(lam * 4.0, 1e8))
        return (theta2, lam2, jnp.where(accept, new_cost, cost)), None

    cost0 = jnp.sum(residuals(theta0) ** 2)
    (theta, _, cost), _ = jax.lax.scan(
        step, (theta0, jnp.asarray(1e-3, theta0.dtype), cost0),
        None, length=iters)
    intr, poses = unpack(theta)
    return intr, poses, jnp.sqrt(cost / (V * N))


def calibrate_omnidirectional(obj_points: np.ndarray, img_points: np.ndarray,
                              iters: int = 60,
                              xi0_candidates=(0.2, 0.5, 0.8, 1.1)):
    """Omnidirectional (unified mirror) calibration: pinhole Zhang init +
    joint LM over [fx fy cx cy k1 k2 xi] and poses, multi-started over the
    mirror parameter (the (f, xi) pair has local minima; note that narrow-FOV
    targets leave xi unobservable — use boards that span wide view angles)."""
    K0, Hs = zhang_init_intrinsics(obj_points, img_points)
    poses0 = []
    for v in range(len(obj_points)):
        R, t = homography_pose(K0, Hs[v])
        w = np.asarray(lie.so3_log(jnp.asarray(R)))
        poses0.append(np.concatenate([w, t]))
    obj_xyz = np.concatenate([obj_points,
                              np.zeros_like(obj_points[..., :1])], axis=-1)
    best = None
    for xi0 in xi0_candidates:
        # The mirror parameter rescales the apparent focal ~ (1 + xi).
        intr0 = jnp.asarray([K0[0, 0] * (1 + xi0), K0[1, 1] * (1 + xi0),
                             K0[0, 2], K0[1, 2], 0.0, 0.0, xi0])
        intr, poses, rms = _refine_omni(intr0, jnp.asarray(np.stack(poses0)),
                                        jnp.asarray(obj_xyz),
                                        jnp.asarray(img_points), iters=iters)
        if best is None or float(rms) < best[2]:
            best = (np.asarray(intr), np.asarray(poses), float(rms))
    intr, poses, rms = best
    K = np.array([[intr[0], 0, intr[2]], [0, intr[1], intr[3]], [0, 0, 1.0]])
    return {"K": K, "dist": intr[4:6], "xi": float(intr[6]),
            "poses": poses, "rms": rms}


def calibrate_pinhole(obj_points: np.ndarray, img_points: np.ndarray,
                      iters: int = 30, fix_distortion: bool = False):
    """Full calibration: Zhang init + joint LM refinement.

    Args:
      obj_points: (V, N, 2) planar model points (e.g. chessboard corners in
        square-size units).
      img_points: (V, N, 2) detected pixels.

    Returns dict with K (3,3), dist (4,) [k1 k2 p1 p2], poses (V, 6), rms.
    """
    K0, Hs = zhang_init_intrinsics(obj_points, img_points)
    poses0 = []
    for v in range(len(obj_points)):
        R, t = homography_pose(K0, Hs[v])
        w = np.asarray(lie.so3_log(jnp.asarray(R)))
        poses0.append(np.concatenate([w, t]))
    intr0 = jnp.asarray([K0[0, 0], K0[1, 1], K0[0, 2], K0[1, 2],
                         0.0, 0.0, 0.0, 0.0])
    obj_xyz = np.concatenate([obj_points,
                              np.zeros_like(obj_points[..., :1])], axis=-1)
    intr, poses, rms = _refine(intr0, jnp.asarray(np.stack(poses0)),
                               jnp.asarray(obj_xyz), jnp.asarray(img_points),
                               iters=iters, fix_distortion=fix_distortion)
    intr = np.asarray(intr)
    K = np.array([[intr[0], 0, intr[2]], [0, intr[1], intr[3]], [0, 0, 1.0]])
    return {"K": K, "dist": intr[4:8], "poses": np.asarray(poses),
            "rms": float(rms)}
