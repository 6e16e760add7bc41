"""Epipolar degeneracy (dominant plane) detection — DEGENSAC-style.

TPU-native rebuild of the reference's plane-degeneracy machinery
(reference: cpp/src/DO/Sara/MultiViewGeometry/Geometry/EpipolarDegeneracy.hpp
— "Two-view Geometry Estimation Unaffected by a Dominant Plane",
Chum et al. CVPR 2005, Eq. (4)): given an epipolar matrix F (or E in
normalized coordinates) and 3 correspondences consistent with it, the
homography of the plane through their 3-D points is

    H = A - e2 (M^-1 b)^T,   A = [e2]_x F,

and a sample/inlier set dominated by one plane is detected by counting
how many correspondences that H explains.

Everything is branch-free batched jnp, usable inside jitted RANSAC loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cross_mat(v):
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
    ], axis=-2)


def epipoles(F: jnp.ndarray):
    """Left/right epipoles of F (..., 3, 3): F e1 = 0, F^T e2 = 0."""
    _, _, Vt = jnp.linalg.svd(F)
    e1 = Vt[..., -1, :]
    _, _, Vt2 = jnp.linalg.svd(jnp.swapaxes(F, -1, -2))
    e2 = Vt2[..., -1, :]
    return e1, e2


def homography_from_epipolar(F: jnp.ndarray, x1: jnp.ndarray,
                             x2: jnp.ndarray) -> jnp.ndarray:
    """Plane homography from F and 3 F-consistent correspondences.

    x1, x2: (3, 2). Returns H (3, 3) with x2 ~ H x1 for coplanar points
    (reference Eq. (4) implementation, EpipolarDegeneracy.hpp:31-60).
    """
    _, e2 = epipoles(F)
    A = _cross_mat(e2) @ F
    ones = jnp.ones(x1.shape[:-1] + (1,), x1.dtype)
    X1 = jnp.concatenate([x1, ones], axis=-1)          # (3, 3)
    X2 = jnp.concatenate([x2, ones], axis=-1)

    u = jnp.cross(X2, X1 @ A.T)                        # (3, 3)
    vv = jnp.cross(X2, jnp.broadcast_to(e2, X2.shape))
    b = jnp.sum(u * vv, axis=-1) / jnp.maximum(
        jnp.sum(vv * vv, axis=-1), 1e-30)              # (3,)

    from sara_tpu.ops.smallmat import batched_inv

    Minv = batched_inv(X1)                             # rows = x1_i^T
    return A - jnp.outer(e2, Minv @ b)


def homography_transfer_error(H: jnp.ndarray, x1: jnp.ndarray,
                              x2: jnp.ndarray) -> jnp.ndarray:
    """Forward transfer error |x2 - proj(H x1)| per correspondence."""
    ones = jnp.ones(x1.shape[:-1] + (1,), x1.dtype)
    p = jnp.concatenate([x1, ones], axis=-1) @ H.T
    z = jnp.where(jnp.abs(p[..., 2:3]) < 1e-12, 1e-12, p[..., 2:3])
    return jnp.linalg.norm(p[..., :2] / z - x2, axis=-1)


def dominant_plane_ratio(F: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                         inlier_mask: jnp.ndarray,
                         threshold: float = 3.0,
                         n_triples: int = 8,
                         key=None) -> jnp.ndarray:
    """Fraction of epipolar inliers explained by a single plane homography.

    Fits homographies from random F-consistent inlier triples (the
    reference enumerates fixed triples of its 7-point sample,
    EpipolarDegeneracy.hpp:64-80; over a full inlier set random triples
    are the batched analog) and returns the best H-consistency ratio.
    A ratio near 1 signals a plane-degenerate epipolar geometry whose
    relative pose should not be trusted without a model-selection step.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    n = u.shape[0]
    w = inlier_mask.astype(jnp.float32) + 1e-9
    idx = jax.random.categorical(
        key, jnp.log(w)[None, :].repeat(n_triples * 3, 0))  # (T*3,)
    idx = idx.reshape(n_triples, 3)

    def one(tri):
        H = homography_from_epipolar(F, u[tri], v[tri])
        err = homography_transfer_error(H, u, v)
        ok = (err < threshold) & inlier_mask
        return jnp.sum(ok) / jnp.maximum(jnp.sum(inlier_mask), 1)

    return jnp.max(jax.vmap(one)(idx))
