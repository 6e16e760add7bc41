"""Hartley point normalization for linear solvers.

TPU-native rebuild of the reference's data normalizers
(reference: cpp/src/DO/Sara/Geometry/Tools/Normalizer.hpp:24-60
``compute_normalizer``, MultiViewGeometry/Geometry/Normalizer.hpp:30-197).

Masked: padded correspondences (mask=False) do not influence the transform.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_points(x: jnp.ndarray, mask: jnp.ndarray | None = None):
    """Hartley isotropic normalization of (N, 2) points.

    Returns (x_norm (N,2), T (3,3)) with T mapping raw -> normalized
    homogeneous coordinates: centroid at origin, mean distance sqrt(2).
    """
    if mask is None:
        mask = jnp.ones(x.shape[:-1], bool)
    w = mask.astype(x.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(x * w[..., None], axis=0) / n
    d = jnp.linalg.norm(x - mean, axis=-1)
    scale = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(d * w) / n, 1e-12)
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], x.dtype)
    T = T.at[0, 0].set(scale).at[1, 1].set(scale)
    T = T.at[0, 2].set(-scale * mean[0]).at[1, 2].set(-scale * mean[1])
    xn = (x - mean) * scale
    return xn, T


def hartley_normalize(u: jnp.ndarray, v: jnp.ndarray, mask=None):
    """Normalize both sides of a correspondence set. Returns
    (un, vn, Tu, Tv)."""
    un, Tu = normalize_points(u, mask)
    vn, Tv = normalize_points(v, mask)
    return un, vn, Tu, Tv


def denormalize_fundamental(Fn: jnp.ndarray, Tu: jnp.ndarray, Tv: jnp.ndarray):
    """F = Tv^T Fn Tu (residual v'^T F u on raw pixels)."""
    return Tv.T @ Fn @ Tu


def denormalize_homography(Hn: jnp.ndarray, Tu: jnp.ndarray, Tv: jnp.ndarray):
    """H = Tv^{-1} Hn Tu."""
    return jnp.linalg.inv(Tv) @ Hn @ Tu
