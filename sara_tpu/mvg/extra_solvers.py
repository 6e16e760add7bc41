"""Additional minimal solvers: 2-pt absolute translation, vanishing points.

TPU-native rebuild of the remaining reference solvers
(reference: cpp/src/DO/Sara/MultiViewGeometry/MinimalSolvers/
AbsoluteTranslationSolver.hpp:27-77 — translation given known rotation;
SingleView/VanishingPoint.hpp — vanishing point from line pencils).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def absolute_translation(R: jnp.ndarray, Xw: jnp.ndarray, rays: jnp.ndarray):
    """Camera translation given rotation and >= 2 point-ray correspondences.

    Solves min_t sum || (I - r r^T)(R X + t) ||^2 — each bearing ray r
    constrains t to the line through -R X along r. Linear least squares,
    closed form (reference: AbsoluteTranslationSolver).

    Args: R (3,3); Xw (N,3) scene points; rays (N,3) unit bearings.
    Returns t (3,).
    """
    I = jnp.eye(3, dtype=R.dtype)
    P = I[None] - rays[:, :, None] * rays[:, None, :]   # (N, 3, 3) projectors
    A = jnp.sum(P, axis=0)
    b = -jnp.sum(jnp.einsum("nij,nj->ni", P, Xw @ R.T), axis=0)
    return jnp.linalg.solve(A + 1e-12 * I, b)


def vanishing_point_from_lines(lines: jnp.ndarray, weights=None):
    """Least-squares vanishing point of a pencil of homogeneous lines.

    Args: lines (N, 3) with l . p = 0 for points p on the line (normalized
    however the caller likes); weights (N,) optional.
    Returns homogeneous vp (3,) (smallest singular vector of the stacked
    line matrix).
    """
    A = lines
    if weights is not None:
        A = A * weights[:, None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    return Vt[-1]


def line_through(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous line through two image points (batched): l = p x q."""
    ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
    qh = jnp.concatenate([q, jnp.ones_like(q[..., :1])], axis=-1)
    return jnp.cross(ph, qh)
