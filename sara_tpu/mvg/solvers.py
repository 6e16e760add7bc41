"""Direct linear minimal solvers: 8-pt / 7-pt fundamental, 4-pt homography.

TPU-native rebuild of the reference solvers
(reference: cpp/src/DO/Sara/MultiViewGeometry/MinimalSolvers/
EightPointAlgorithm.hpp:35-36, SevenPointAlgorithm.hpp:26-27,
HomographySolver.hpp:35-36). Every solver consumes a fixed-size minimal
sample and returns a fixed number of candidate models plus a validity mask,
so the whole RANSAC hypothesis batch runs as one vmapped program.

SVD-based null spaces use ``jnp.linalg.svd``, which XLA supports batched on
TPU. All solvers expect *normalized* coordinates (see ``normalizer``) for
conditioning; denormalization is the caller's job.
"""

from __future__ import annotations

import jax.numpy as jnp

from sara_tpu.core import poly


def _epipolar_design_rows(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rows of the epipolar design matrix: v^T F u = 0 per correspondence.

    u, v: (N, 2). Returns (N, 9) with F vectorized row-major.
    """
    ux, uy = u[..., 0], u[..., 1]
    vx, vy = v[..., 0], v[..., 1]
    one = jnp.ones_like(ux)
    return jnp.stack(
        [vx * ux, vx * uy, vx, vy * ux, vy * uy, vy, ux, uy, one], axis=-1)


def eight_point_fundamental(u: jnp.ndarray, v: jnp.ndarray):
    """8+ point linear fundamental matrix with rank-2 projection.

    Args: u, v (N>=8, 2) normalized correspondences.
    Returns (F (1, 3, 3), valid (1,)) — one model, fixed shape.
    """
    A = _epipolar_design_rows(u, v)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    F = Vt[-1].reshape(3, 3)
    # Enforce rank 2.
    Uf, Sf, Vtf = jnp.linalg.svd(F)
    S2 = Sf.at[2].set(0.0)
    F = (Uf * S2[None, :]) @ Vtf
    valid = jnp.array([True])
    return F[None], valid


def seven_point_fundamental(u: jnp.ndarray, v: jnp.ndarray):
    """7-point fundamental: 2-D null space + cubic det constraint.

    Returns (F (3, 3, 3), valid (3,)) — up to three real solutions
    (reference: SevenPointAlgorithm.cpp).
    """
    A = _epipolar_design_rows(u, v)  # (7, 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    F1 = Vt[-1].reshape(3, 3)
    F2 = Vt[-2].reshape(3, 3)

    # det(a F1 + (1-a) F2) = 0 -> cubic in a.
    def det3(M):
        return (M[0, 0] * (M[1, 1] * M[2, 2] - M[1, 2] * M[2, 1])
                - M[0, 1] * (M[1, 0] * M[2, 2] - M[1, 2] * M[2, 0])
                + M[0, 2] * (M[1, 0] * M[2, 1] - M[1, 1] * M[2, 0]))

    # Expand det(F2 + a (F1 - F2)) as cubic in a by 4-point interpolation at
    # a = 0, 1, -1, 2 (exact for degree 3).
    D = F1 - F2
    d0 = det3(F2)
    d1 = det3(F2 + D)
    dm1 = det3(F2 - D)
    d2 = det3(F2 + 2.0 * D)
    # c0 + c1 a + c2 a^2 + c3 a^3 from values at a = 0, 1, -1, 2.
    c0 = d0
    c2 = 0.5 * (d1 + dm1) - d0
    c3 = (d2 - c0 - 4.0 * c2 - d1 + dm1) / 6.0
    c1 = 0.5 * (d1 - dm1) - c3
    roots, valid = poly.roots_cubic(c3, c2, c1, c0)
    a = roots[..., None, None]
    F = F2[None] + a * D[None]
    # Normalize scale for stable downstream thresholds.
    F = F / jnp.maximum(jnp.linalg.norm(F.reshape(3, -1), axis=-1), 1e-12)[:, None, None]
    return F, valid


def four_point_homography(u: jnp.ndarray, v: jnp.ndarray):
    """4+ point DLT homography.

    Uses the full 2N x 9 DLT + SVD null space (more robust than the
    reference's inhomogeneous 8x8 variant, HomographySolver.cpp:17-47, and
    equally batched on TPU).
    Returns (H (1, 3, 3), valid (1,)).
    """
    ux, uy = u[..., 0], u[..., 1]
    vx, vy = v[..., 0], v[..., 1]
    one = jnp.ones_like(ux)
    zero = jnp.zeros_like(ux)
    r1 = jnp.stack([ux, uy, one, zero, zero, zero,
                    -vx * ux, -vx * uy, -vx], axis=-1)
    r2 = jnp.stack([zero, zero, zero, ux, uy, one,
                    -vy * ux, -vy * uy, -vy], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2N, 9)
    _, s, Vt = jnp.linalg.svd(A, full_matrices=True)
    H = Vt[-1].reshape(3, 3)
    H = H / jnp.where(jnp.abs(H[2, 2]) > 1e-12, H[2, 2], 1e-12)
    valid = jnp.array([True])
    return H[None], valid
