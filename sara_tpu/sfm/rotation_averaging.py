"""Global rotation averaging: spectral relaxation + IRLS.

TPU-native implementation of the capability the reference only sketches in
Python (reference: python/oddkiva/sara/sfm/rotation_averaging.py) — the
initialization stage for global SfM pipelines.

Method (Arie-Nachimson et al. style eigenvalue relaxation): build the
symmetric 3n x 3n block "rotation connection" matrix A with A[j, i] = w R_ij
(measurement R_j ~= R_ij R_i) and A[i, j] = w R_ij^T. The stacked true
rotations form the dominant rank-3 invariant subspace, so the top-3
eigenvectors of the degree-normalized A (via ``jnp.linalg.eigh`` — symmetric
eig is XLA-native on TPU, unlike nonsymmetric eig) recover all rotations up
to one global gauge; blocks are projected onto SO(3) by batched SVD.
IRLS (Cauchy on the chordal residual) rejects outlier edges.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _project_so3(M):
    """Nearest rotation(s) by SVD (batched), det = +1 enforced."""
    from sara_tpu.ops.smallmat import det3

    U, _, Vt = jnp.linalg.svd(M)
    d = det3(U @ Vt)
    S = jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d], axis=-1)
    return (U * S[..., None, :]) @ Vt


def _solve_once(n, edge_i, edge_j, R_rel, w):
    dtype = R_rel.dtype
    A = jnp.zeros((n, 3, n, 3), dtype)
    wR = R_rel * w[:, None, None]
    A = A.at[edge_j, :, edge_i, :].add(wR)
    A = A.at[edge_i, :, edge_j, :].add(jnp.swapaxes(wR, -1, -2))
    deg = jnp.zeros((n,), dtype).at[edge_i].add(w).at[edge_j].add(w)
    dinv = 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-9))
    A = A * dinv[:, None, None, None] * dinv[None, None, :, None]
    Af = A.reshape(3 * n, 3 * n)
    evals, evecs = jnp.linalg.eigh(Af)
    U = evecs[:, -3:]                    # (3n, 3) top eigenvectors
    B = U.reshape(n, 3, 3)               # per-node 3x3 blocks
    # Remove the global gauge: B_k = R_k G with G (scaled) orthogonal, so
    # B_k B_0^T = (1/n) R_k R_0^T regardless of whether G is improper —
    # do NOT project B_0 first (that would flip the gauge when det(G) < 0).
    R = _project_so3(jnp.einsum("nab,cb->nac", B, B[0]))
    return R


@functools.partial(jax.jit, static_argnames=("n", "irls_iters"))
def average_rotations(n: int, edge_i=None, edge_j=None, R_rel=None,
                      edge_mask=None, irls_iters: int = 4):
    """Estimate absolute rotations from relative measurements.

    Args:
      n: number of cameras (static).
      edge_i, edge_j: (E,) int32; measurement convention R_j ~= R_rel @ R_i.
      R_rel: (E, 3, 3).
      edge_mask: (E,) bool.

    Returns R: (n, 3, 3) absolute rotations with R[0] = I (gauge).
    """
    E = edge_i.shape[0]
    if edge_mask is None:
        edge_mask = jnp.ones((E,), bool)
    w0 = edge_mask.astype(R_rel.dtype)

    w = w0
    R = _solve_once(n, edge_i, edge_j, R_rel, w)
    for _ in range(irls_iters - 1):
        res = jnp.linalg.norm(
            (R[edge_j] - jnp.einsum("eab,ebc->eac", R_rel, R[edge_i]))
            .reshape(E, 9), axis=-1)
        sigma = 0.5
        w = w0 / (1.0 + (res / sigma) ** 2)
        R = _solve_once(n, edge_i, edge_j, R_rel, w)
    return R
