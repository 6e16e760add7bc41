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


def _solve_once(n, edge_i, edge_j, R_rel, w, iters: int = 300):
    """Top-3 invariant subspace of the normalized rotation-connection
    operator by SHIFTED SUBSPACE ITERATION with edge-structured matvecs.

    A dense ``eigh`` of the (3n)^2 connection matrix is O((3n)^3) in a
    SINGLE-threaded LAPACK custom call on XLA:CPU — measured ~45+ min at
    n=1024 (it was the entire city-scale averaging budget). The operator
    only has 2E off-diagonal blocks, so applying it is O(E); (I + A~)
    power iterations with per-step QR reach the same subspace in
    O(E * iters). Init sloppiness is fine: the tangent-space Gauss-Newton
    refinement (below) supplies the precision.
    """
    dtype = R_rel.dtype
    deg = jnp.zeros((n,), dtype).at[edge_i].add(w).at[edge_j].add(w)
    dinv = 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-9))
    wR = R_rel * w[:, None, None]
    wRT = jnp.swapaxes(wR, -1, -2)

    def matvec(U):                       # U: (n, 3, 3) block columns
        V = U * dinv[:, None, None]
        y = (jnp.zeros_like(U)
             .at[edge_j].add(jnp.einsum("eab,ebc->eac", wR, V[edge_i]))
             .at[edge_i].add(jnp.einsum("eab,ebc->eac", wRT, V[edge_j])))
        return y * dinv[:, None, None]

    def body(_, U):
        U = U + matvec(U)                # shift: top eigenvalues are ~ +1
        Q, _ = jnp.linalg.qr(U.reshape(3 * n, 3))
        return Q.reshape(n, 3, 3)

    U0 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (n, 3, 3))
    B = jax.lax.fori_loop(0, iters, body, U0 / jnp.sqrt(float(n)))
    # Remove the global gauge: B_k = R_k G with G (scaled) orthogonal, so
    # B_k B_0^T = (1/n) R_k R_0^T regardless of whether G is improper —
    # do NOT project B_0 first (that would flip the gauge when det(G) < 0).
    R = _project_so3(jnp.einsum("nab,cb->nac", B, B[0]))
    return R


def _log_batch(R):
    """Batched SO(3) log map, (E, 3, 3) -> (E, 3) (small/moderate angles)."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    c = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(c)
    v = 0.5 * jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                         R[..., 0, 2] - R[..., 2, 0],
                         R[..., 1, 0] - R[..., 0, 1]], axis=-1)
    s = jnp.sin(theta)
    # theta/sin(theta), series-safe near 0.
    fac = jnp.where(theta < 1e-4, 1.0 + theta * theta / 6.0,
                    theta / jnp.maximum(s, 1e-12))
    return v * fac[..., None]


def _exp_batch(v):
    """Batched SO(3) exp map, (n, 3) -> (n, 3, 3) (Rodrigues)."""
    theta = jnp.linalg.norm(v, axis=-1, keepdims=True)
    small = theta < 1e-8
    a = jnp.where(small, 1.0, jnp.sin(theta) / jnp.maximum(theta, 1e-12))
    b = jnp.where(small, 0.5,
                  (1.0 - jnp.cos(theta)) / jnp.maximum(theta ** 2, 1e-12))
    zero = jnp.zeros_like(v[..., 0])
    Kx = jnp.stack([
        jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1)], axis=-2)
    eye = jnp.eye(3, dtype=v.dtype)
    return (eye + a[..., None] * Kx
            + b[..., None] * jnp.einsum("nab,nbc->nac", Kx, Kx))


def _refine_tangent(n, R, edge_i, edge_j, R_rel, w, outer: int = 3,
                    inner: int = 16):
    """Local Gauss-Newton polish of the spectral solution.

    The spectral relaxation has SYSTEMATIC error on weakly connected
    (chain-like) graphs — the top-3 eigenspace mixes when the spectral gap
    is small; measured 0.7 deg median / 17 deg max global error from
    0.02 deg edges on a 96-view boustrophedon sweep. First-order model:
    perturbing R_v <- exp(d_v) R_v turns each edge residual
    r_e = log(R_rel R_i R_j^T) into |r_e + R_rel d_i - d_j|^2 (the i-side
    tangent transports through the edge rotation) — a sparse Gauss-Newton
    system in so(3)^n solved DIRECTLY with the node-0 gauge pinned by
    masking its rows/columns. A direct solve matters twice: Jacobi/CG
    sweeps propagate corrections one hop per sweep, far too slow for the
    smooth error modes of 1000-view chains (graph diameter ~N/window), and
    the naive "subtract d_0" gauge projection is inconsistent under the
    adjoint transport (measured: it made the refinement DRIFT 0.4 -> 1.2
    rad over IRLS rounds at 15% outliers). O((3n)^3) per linearization —
    the same cost class as the translation solve, trivial on the MXU.
    """
    del inner  # direct solve; kept for signature compat
    dt = R.dtype
    eyeN = jnp.eye(3 * n, dtype=dt)
    gmask = jnp.concatenate([jnp.zeros(3, dt), jnp.ones(3 * (n - 1), dt)])

    def outer_body(_, R):
        r = _log_batch(jnp.einsum("eab,ebc,edc->ead", R_rel, R[edge_i],
                                  R[edge_j]))          # (E, 3)
        A = R_rel
        wA = w[:, None, None] * A
        eye3 = jnp.eye(3, dtype=dt)
        H = (jnp.zeros((n, 3, n, 3), dt)
             .at[edge_i, :, edge_i, :].add(w[:, None, None] * eye3)
             .at[edge_j, :, edge_j, :].add(w[:, None, None] * eye3)
             .at[edge_i, :, edge_j, :].add(-jnp.swapaxes(wA, -1, -2))
             .at[edge_j, :, edge_i, :].add(-wA))
        b = (jnp.zeros((n, 3), dt)
             .at[edge_i].add(-jnp.einsum("eba,eb->ea", wA, r))
             .at[edge_j].add(w[:, None] * r))
        Hf = H.reshape(3 * n, 3 * n)
        Hf = (Hf * gmask[:, None] * gmask[None, :]
              + jnp.diag(1.0 - gmask) + 1e-9 * eyeN)
        d = jnp.linalg.solve(Hf, b.reshape(-1) * gmask).reshape(n, 3)
        return jnp.einsum("nab,nbc->nac", _exp_batch(d), R)

    return jax.lax.fori_loop(0, outer, outer_body, R)


@functools.partial(jax.jit, static_argnames=("n", "irls_iters"))
def average_rotations(n: int, edge_i=None, edge_j=None, R_rel=None,
                      edge_mask=None, irls_iters: int = 4):
    """Estimate absolute rotations from relative measurements.

    Spectral initialization (once), then alternating tangent-space
    Gauss-Newton refinement and Cauchy IRLS reweighting (the eigensolve is
    O((3n)^3) — re-solving it per IRLS round is wasteful and, on thin
    graphs, systematically biased; the local refinement both fixes the
    bias and is O(E) per sweep).

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
    for _ in range(irls_iters):
        # Reweight BEFORE refining: the spectral solution already separates
        # outlier edges by residual; refining at full outlier weight first
        # would drag their endpoint nodes off before IRLS can reject them.
        res = jnp.linalg.norm(
            (R[edge_j] - jnp.einsum("eab,ebc->eac", R_rel, R[edge_i]))
            .reshape(E, 9), axis=-1)
        sigma = 0.5
        # TRIMMED Cauchy: gross edges (chordal residual > ~40 deg) get
        # weight ZERO, not merely small — the tangent linearization of a
        # near-pi residual is directionally meaningless and even a 3%
        # weight drags its endpoints a little EVERY round (measured drift
        # 0.43 -> 1.8 rad over 12 rounds at 15% outliers without the cut).
        w = jnp.where(res > 1.0, 0.0, w0 / (1.0 + (res / sigma) ** 2))
        R = _refine_tangent(n, R, edge_i, edge_j, R_rel, w)
    # Re-fix the gauge to camera 0 (refinement preserves it; keep exact).
    return jnp.einsum("nab,cb->nac", R, R[0])
