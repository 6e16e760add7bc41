"""Two-view geometry: E -> motions, triangulation, epipolar distances.

TPU-native rebuild of the reference two-view machinery
(reference: cpp/src/DO/Sara/MultiViewGeometry/Geometry/EssentialMatrix.hpp:65
``extract_relative_motion_horn``, Geometry/TwoViewGeometry.hpp:25-68,
MinimalSolvers/Triangulation.cpp:20-77,
MinimalSolvers/ErrorMeasures.hpp). All functions broadcast over leading
batch dimensions and are vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def _cofactor(E: jnp.ndarray) -> jnp.ndarray:
    """Cofactor matrix of a 3x3 (batched): cof(E)[i,j] = dE/dE[i,j] of det."""
    c = jnp.cross(E[..., (1, 2, 0), :], E[..., (2, 0, 1), :], axis=-1)
    return c


def essential_to_motions(E: jnp.ndarray):
    """E -> 4 candidate (R, t) motions via SVD decomposition.

    The reference uses Horn's closed form
    (Geometry/EssentialMatrix.cpp:38-59); we use the equivalent, numerically
    robust SVD construction (batched SVD is XLA-native on TPU):
    E = U diag(1,1,0) V^T, R in {U W V^T, U W^T V^T}, t = +/- u3.

    Returns R (..., 4, 3, 3), t (..., 4, 3).
    """
    from sara_tpu.ops.smallmat import det3

    U, S, Vt = jnp.linalg.svd(E)
    # Ensure proper rotations (closed-form 3x3 det: no batched-LU call).
    det_u = det3(U)
    det_v = det3(Vt)
    U = U * det_u[..., None, None]
    Vt = Vt * det_v[..., None, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    Ra = U @ W @ Vt
    Rb = U @ W.T @ Vt
    t = U[..., :, 2]
    R4 = jnp.stack([Ra, Ra, Rb, Rb], axis=-3)
    t4 = jnp.stack([t, -t, t, -t], axis=-2)
    return R4, t4


def triangulate_linear(R: jnp.ndarray, t: jnp.ndarray,
                       ray1: jnp.ndarray, ray2: jnp.ndarray):
    """DLT triangulation of rays under motion (R, t) (camera 1 at identity).

    Args:
      R, t: (3, 3), (3,) relative motion (x2 = R x1 + t).
      ray1, ray2: (N, 3) backprojected rays (homogeneous image points).

    Returns (X (N, 3) points in camera-1 frame, depth1 (N,), depth2 (N,)).

    Uses the 4x4 homogeneous DLT (two rows per view) — algebraically the same
    null space as the reference's 6x6 formulation
    (MinimalSolvers/Triangulation.cpp:20-77) with the scale variables
    eliminated; depths are recomputed by projection.
    """
    P1 = jnp.concatenate([jnp.eye(3, dtype=R.dtype), jnp.zeros((3, 1), R.dtype)], axis=1)
    P2 = jnp.concatenate([R, t[:, None]], axis=1)

    def rows(P, ray):
        # x cross (P X) = 0 -> two independent rows.
        x, y, w = ray[..., 0], ray[..., 1], ray[..., 2]
        r1 = x[..., None] * P[2] - w[..., None] * P[0]
        r2 = y[..., None] * P[2] - w[..., None] * P[1]
        return r1, r2

    a1, a2 = rows(P1, ray1)
    a3, a4 = rows(P2, ray2)
    A = jnp.stack([a1, a2, a3, a4], axis=-2)  # (N, 4, 4)
    _, _, Vt = jnp.linalg.svd(A)
    Xh = Vt[..., -1, :]
    w = Xh[..., 3]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    X = Xh[..., :3] / w[..., None]
    depth1 = X[..., 2]
    depth2 = (jnp.einsum("ij,...j->...i", R, X) + t)[..., 2]
    return X, depth1, depth2


def sampson_epipolar_distance(F: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Sampson distance of correspondences under F (or E with normalized
    coords) — the reference's RANSAC error
    (MinimalSolvers/ErrorMeasures.hpp SampsonEpipolarDistance).

    F: (3,3); u, v: (N, 2). Returns (N,) distances (not squared).
    """
    one = jnp.ones_like(u[..., :1])
    uh = jnp.concatenate([u, one], axis=-1)
    vh = jnp.concatenate([v, one], axis=-1)
    Fu = jnp.einsum("ij,...j->...i", F, uh)      # (N, 3)
    Ftv = jnp.einsum("ji,...j->...i", F, vh)     # (N, 3)
    num = jnp.einsum("...i,...i->...", vh, Fu)
    den = Fu[..., 0] ** 2 + Fu[..., 1] ** 2 + Ftv[..., 0] ** 2 + Ftv[..., 1] ** 2
    return jnp.abs(num) / jnp.sqrt(jnp.maximum(den, 1e-12))


def symmetric_epipolar_distance(F: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Symmetric point-to-epipolar-line distance."""
    one = jnp.ones_like(u[..., :1])
    uh = jnp.concatenate([u, one], axis=-1)
    vh = jnp.concatenate([v, one], axis=-1)
    Fu = jnp.einsum("ij,...j->...i", F, uh)
    Ftv = jnp.einsum("ji,...j->...i", F, vh)
    num = jnp.abs(jnp.einsum("...i,...i->...", vh, Fu))
    d1 = num / jnp.sqrt(jnp.maximum(Fu[..., 0] ** 2 + Fu[..., 1] ** 2, 1e-12))
    d2 = num / jnp.sqrt(jnp.maximum(Ftv[..., 0] ** 2 + Ftv[..., 1] ** 2, 1e-12))
    return 0.5 * (d1 + d2)


def symmetric_transfer_error(H: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Symmetric homography transfer error (pixels)."""

    def transfer(M, p):
        one = jnp.ones_like(p[..., :1])
        ph = jnp.concatenate([p, one], axis=-1)
        q = jnp.einsum("ij,...j->...i", M, ph)
        w = jnp.where(jnp.abs(q[..., 2:]) < 1e-12, 1e-12, q[..., 2:])
        return q[..., :2] / w

    Hinv = jnp.linalg.inv(H)
    d1 = jnp.linalg.norm(transfer(H, u) - v, axis=-1)
    d2 = jnp.linalg.norm(transfer(Hinv, v) - u, axis=-1)
    return 0.5 * (d1 + d2)


def two_view_geometry(E: jnp.ndarray, ray1: jnp.ndarray, ray2: jnp.ndarray,
                      mask: jnp.ndarray | None = None):
    """Resolve the 4-fold motion ambiguity by cheirality voting.

    Triangulates the given correspondences under each of the 4 motions and
    returns the (R, t) with the most points in front of both cameras,
    plus per-point cheirality for the winner
    (reference: MinimalSolvers/RelativePoseSolver.hpp:40-80,
    Geometry/TwoViewGeometry.hpp two_view_geometry()).
    """
    if mask is None:
        mask = jnp.ones(ray1.shape[:-1], bool)
    R4, t4 = essential_to_motions(E)

    def score(R, t):
        X, d1, d2 = triangulate_linear(R, t, ray1, ray2)
        cheiral = (d1 > 0) & (d2 > 0) & mask
        return jnp.sum(cheiral.astype(jnp.int32)), cheiral, X

    import jax

    counts, cheirals, Xs = jax.vmap(score)(R4, t4)
    best = jnp.argmax(counts)
    return (R4[best], t4[best], Xs[best], cheirals[best], counts[best])
