"""Five-point relative pose (essential matrix) solver, TPU-native.

Solves the same problem as the reference's Nister / Stewenius solvers
(reference: cpp/src/DO/Sara/MultiViewGeometry/MinimalSolvers/
NisterFivePointAlgorithm.hpp:31-93, SteweniusFivePointAlgorithm.cpp:18-126),
but with a formulation designed for XLA/TPU, where no nonsymmetric
eigensolver exists (both reference variants need one — companion matrix or
action matrix). Design:

1. Null space: SVD of the 5x9 epipolar design matrix; E(x,y,z) =
   x X + y Y + z Z + W over the right 4-dimensional null basis.
2. The 10 cubic constraints (det E = 0 and 2 E E^T E - tr(E E^T) E = 0)
   are written as C(z) @ m(x, y) = 0 where m is the 10-vector of (x, y)
   monomials up to degree 3 and C(z) = C0 + C1 z + C2 z^2 + C3 z^3.
   The coefficient matrices are extracted *numerically* by evaluating the
   constraints at 20 fixed generic points and applying a precomputed inverse
   Vandermonde — no symbolic codegen (the reference ships SymPy-generated
   headers; we don't need them).
3. Hidden-variable resultant: solutions require det C(z) = 0. Real roots
   are found by sign-bracketing + bisection of the row-normalized
   trig-homogenized determinant g(phi) = det(C0 c^3 + C1 c^2 s + C2 c s^2
   + C3 s^3), z = tan(phi) — entries stay O(1) and every step is
   branch-free under vmap.
4. Robustness: the (x, y, z, w) basis split is arbitrary, and roots with
   |z| large sit in the ill-conditioned tail of the pencil (the z^3
   coefficient matrix is structurally rank-1). The solver therefore runs
   the search over several fixed random orthogonal *remixes* of the null
   basis, restricted to the well-conditioned window |z| <= tan(PHI_MAX);
   every true solution appears at moderate |z| in some remix with high
   probability. An adaptive subdivision pass recovers close root pairs.
5. Per root: null vector of C(z) by SVD gives (x, y); assemble E and
   validate against the essential constraints.

Returns up to ``MAX_SOLUTIONS`` essential matrices with a validity mask.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

MAX_SOLUTIONS = 10
# 4 remixes: 3 was measured right at the 99%-generic-recovery gate
# (98.7-99.7% across seeds, scripts/mc_fivepoint.py); the 4th buys the
# margin.
_N_REMIX = 4
_ROOTS_PER_REMIX = 8
_GRID = 192
_PHI_MAX = 1.45           # |z| <= tan(1.45) ~ 8.2 per remix
# Sequential depth is what costs on this runtime (each loop step is a
# dependent kernel): a 2x finer grid (one extra column in a single batched
# matmul) lets 4 halvings of a ~0.015 rad cell + 3 clamped Newton steps on
# the series reach the same ~1e-7 rad the old 12-halving chain did, at 9
# fewer sequential steps per E-RANSAC program. Gated by the >=99%
# Monte-Carlo recovery test (scripts/mc_fivepoint.py).
_BISECT_ITERS = 4
_NEWTON_ITERS = 3
_N_SUSPICIOUS = 3         # cells re-examined for hidden root pairs
_SUBDIV = 16              # subsamples per suspicious cell

# ---------------------------------------------------------------------------
# Static monomial bookkeeping (computed once with numpy at import time).
# ---------------------------------------------------------------------------

# (x, y) monomial order for the columns of C(z).
_XY_MONOMIALS = [(3, 0), (2, 1), (1, 2), (0, 3), (2, 0),
                 (1, 1), (0, 2), (1, 0), (0, 1), (0, 0)]
# All degree-<=3 trivariate monomials (a, b, c) for x^a y^b z^c.
_XYZ_MONOMIALS = [(a, b, c)
                  for c in range(4)
                  for (a, b) in _XY_MONOMIALS
                  if a + b + c <= 3]
assert len(_XYZ_MONOMIALS) == 20

# Generic evaluation points and the inverse Vandermonde (f64, constant).
_rs = np.random.RandomState(12345)
_PTS = _rs.uniform(-1.0, 1.0, size=(20, 3))
_VAND = np.stack([
    [p[0] ** a * p[1] ** b * p[2] ** c for (a, b, c) in _XYZ_MONOMIALS]
    for p in _PTS
])  # (20 points, 20 monomials)
_VAND_INV = np.linalg.inv(_VAND)
assert np.linalg.cond(_VAND) < 1e6

# Scatter maps: trivariate monomial index -> (z-degree k, xy column).
_ZDEG = np.array([c for (_, _, c) in _XYZ_MONOMIALS])
_XYCOL = np.array([_XY_MONOMIALS.index((a, b)) for (a, b, _) in _XYZ_MONOMIALS])

# Second start vector for the null-space inverse iteration (fixed random
# unit direction, independent of the all-ones first start).
_START2 = _rs.normal(size=10)
_START2 /= np.linalg.norm(_START2)

# Fixed random orthogonal basis remixes (first = identity).
_QS = [np.eye(4)]
for _i in range(_N_REMIX - 1):
    _q, _ = np.linalg.qr(_rs.normal(size=(4, 4)))
    _QS.append(_q)
_REMIXES = np.stack(_QS)  # (_N_REMIX, 4, 4)

# --- Fourier representation of the homogenized resultant -------------------
# g(phi) = det(C0 c^3 + C1 c^2 s + C2 c s^2 + C3 s^3), (s, c) = sin/cos(phi),
# is a homogeneous degree-30 form in (c, s): a pi-periodic trig polynomial
# spanned by {cos(k phi)}_{k=0,2,..,30} and {sin(k phi)}_{k=2,4,..,30} —
# exactly 31 coefficients. Sampling g at 31 fixed nodes therefore determines
# it EXACTLY; every further evaluation (grid scan, subdivision, bisection)
# becomes a 31-term series instead of a 10x10 LU determinant. This cuts the
# ~467 batched small-LU factorizations per hypothesis/remix (the dominant
# cost of E-RANSAC on TPU: batched small LU lowers very poorly) to 31.
_N_SAMP = 31
_K_COS = np.arange(0, 31, 2)   # 16 cosine harmonics
_K_SIN = np.arange(2, 31, 2)   # 15 sine harmonics


def _trig_basis_np(phi):
    phi = np.asarray(phi, np.float64)
    return np.concatenate([np.cos(np.outer(phi, _K_COS)),
                           np.sin(np.outer(phi, _K_SIN))], axis=1)


_PHI_NODES = -np.pi / 2 + np.pi * np.arange(_N_SAMP) / _N_SAMP
_B_NODES_INV = np.linalg.inv(_trig_basis_np(_PHI_NODES))
assert np.linalg.cond(_trig_basis_np(_PHI_NODES)) < 50.0  # DFT-like: ~O(1)
_GRID_PHI = np.linspace(-_PHI_MAX, _PHI_MAX, _GRID)
_B_GRID = _trig_basis_np(_GRID_PHI)  # (_GRID, 31)


def _constraints(E: jnp.ndarray) -> jnp.ndarray:
    """The 10 essential constraints of E (..., 3, 3) -> (..., 10).

    [det(E), vec(2 E E^T E - tr(E E^T) E)].
    """
    from sara_tpu.ops.smallmat import det3

    det = det3(E)
    EEt = E @ jnp.swapaxes(E, -1, -2)
    tr = jnp.trace(EEt, axis1=-2, axis2=-1)
    M = 2.0 * EEt @ E - tr[..., None, None] * E
    return jnp.concatenate([det[..., None], M.reshape(*M.shape[:-2], 9)], axis=-1)


def _coefficient_matrices(X, Y, Z, W):
    """Extract C0..C3 (each 10x10) for E = xX + yY + zZ + W numerically."""
    dtype = X.dtype
    pts = jnp.asarray(_PTS, dtype)
    E_pts = (pts[:, 0, None, None] * X + pts[:, 1, None, None] * Y
             + pts[:, 2, None, None] * Z + W)          # (20, 3, 3)
    vals = _constraints(E_pts)                          # (20, 10)
    coeffs = jnp.asarray(_VAND_INV, dtype) @ vals       # (20 monos, 10 cons)
    C = jnp.zeros((4, 10, 10), dtype)
    # Place coeffs[m, i] at C[zdeg(m), i, xycol(m)].
    C = C.at[jnp.asarray(_ZDEG), :, jnp.asarray(_XYCOL)].add(coeffs)
    return C  # (4, 10, 10): C[k] multiplies z^k


def _resultant_coeffs(C):
    """Fourier coefficients of g(phi) = det of the homogenized pencil.

    Rows are scaled by a phi-INDEPENDENT factor (the norm of the stacked
    coefficient rows) so the polynomial structure survives while entries
    stay O(1) — a per-phi row normalization would not be a polynomial and
    could not be interpolated. Exact for the degree-30 form; 31 determinant
    evaluations total.
    """
    dtype = C.dtype
    rown = jnp.linalg.norm(
        jnp.concatenate([C[0], C[1], C[2], C[3]], axis=-1), axis=-1)
    Cs = C / jnp.maximum(rown, 1e-30)[None, :, None]
    phi = jnp.asarray(_PHI_NODES, dtype)
    s, c = jnp.sin(phi), jnp.cos(phi)
    M = (Cs[0][None] * (c ** 3)[:, None, None]
         + Cs[1][None] * (c * c * s)[:, None, None]
         + Cs[2][None] * (c * s * s)[:, None, None]
         + Cs[3][None] * (s ** 3)[:, None, None])
    # Batch-last Gauss-Jordan determinant: jnp.linalg.det's LU custom call
    # pads each 10x10 to (8, 128) tiles (~20x HBM inflation; OOM'd the
    # vmapped pair-chunk program) and is slower than VPU elimination.
    from sara_tpu.ops.smallmat import batched_det

    samples = batched_det(M)                        # (31,)
    return jnp.asarray(_B_NODES_INV, dtype) @ samples


def _series_eval(coeff, phi):
    """Evaluate the 31-term trig series at arbitrary phi (any shape)."""
    kc = jnp.asarray(_K_COS, coeff.dtype)
    ks = jnp.asarray(_K_SIN, coeff.dtype)
    b = jnp.concatenate([jnp.cos(phi[..., None] * kc),
                         jnp.sin(phi[..., None] * ks)], axis=-1)
    return b @ coeff


def _find_roots(C, dtype):
    """Real roots of det C(z) = 0 with |z| <= tan(_PHI_MAX).

    Returns (z (_ROOTS_PER_REMIX,), has_root (_ROOTS_PER_REMIX,))."""
    R = _ROOTS_PER_REMIX
    coeff = _resultant_coeffs(C)
    phi = jnp.linspace(-_PHI_MAX, _PHI_MAX, _GRID, dtype=dtype)
    geval = lambda p: _series_eval(coeff, p)
    g = jnp.asarray(_B_GRID, dtype) @ coeff         # geval at the fixed grid
    sign = jnp.sign(g)
    change = (sign[:-1] * sign[1:]) < 0
    _, idx = jax.lax.top_k(jnp.where(change, 1.0, 0.0), R)
    has = jnp.take_along_axis(change, idx, axis=0)
    lo, hi, glo = phi[idx], phi[idx + 1], g[idx]

    # Subdivision pass for close pairs: local minima of |g| w/o sign change.
    absg = jnp.abs(g)
    interior_min = ((absg[1:-1] < absg[:-2]) & (absg[1:-1] < absg[2:])
                    & ~change[:-1] & ~change[1:])
    _, sus_idx = jax.lax.top_k(jnp.where(interior_min, -absg[1:-1], -jnp.inf),
                               _N_SUSPICIOUS)
    sus_valid = jnp.take_along_axis(interior_min, sus_idx, axis=0)
    ctr = sus_idx + 1
    sub_lo = phi[jnp.maximum(ctr - 1, 0)]
    sub_hi = phi[jnp.minimum(ctr + 1, _GRID - 1)]
    frac = jnp.linspace(0.0, 1.0, _SUBDIV + 1, dtype=dtype)
    sub_phi = sub_lo[:, None] + (sub_hi - sub_lo)[:, None] * frac[None, :]
    sub_g = geval(sub_phi)
    ssign = jnp.sign(sub_g)
    sub_change = ((ssign[:, :-1] * ssign[:, 1:]) < 0) & sus_valid[:, None]
    _, sc_idx = jax.lax.top_k(jnp.where(sub_change, 1.0, 0.0), 2)
    sub_has = jnp.take_along_axis(sub_change, sc_idx, axis=1).reshape(-1)
    s_lo = jnp.take_along_axis(sub_phi, sc_idx, axis=1).reshape(-1)
    s_hi = jnp.take_along_axis(sub_phi, sc_idx + 1, axis=1).reshape(-1)
    s_glo = jnp.take_along_axis(sub_g, sc_idx, axis=1).reshape(-1)

    all_lo = jnp.concatenate([lo, s_lo])
    all_hi = jnp.concatenate([hi, s_hi])
    all_glo = jnp.concatenate([glo, s_glo])
    all_has = jnp.concatenate([has, sub_has])
    _, keep = jax.lax.top_k(jnp.where(all_has, 1.0, 0.0), R)
    lo, hi, glo, has = all_lo[keep], all_hi[keep], all_glo[keep], all_has[keep]

    def body(_, state):
        lo, hi, glo = state
        mid = 0.5 * (lo + hi)
        gmid = geval(mid)
        left = (glo * gmid) <= 0
        return (jnp.where(left, lo, mid), jnp.where(left, mid, hi),
                jnp.where(left, glo, gmid))

    lo, hi, glo = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo, hi, glo))
    phi_r = 0.5 * (lo + hi)

    # Newton tail on the trig series (derivative is the same series with
    # k-weighted coefficients); steps clamped to the bracket width.
    kc = jnp.asarray(_K_COS, dtype)
    ks = jnp.asarray(_K_SIN, dtype)

    def dgeval(p):
        b = jnp.concatenate([-kc * jnp.sin(p[..., None] * kc),
                             ks * jnp.cos(p[..., None] * ks)], axis=-1)
        return b @ coeff

    width = hi - lo
    for _ in range(_NEWTON_ITERS):
        g_r = geval(phi_r)
        dg = dgeval(phi_r)
        step = -g_r / jnp.where(jnp.abs(dg) < 1e-30, 1e-30, dg)
        phi_r = phi_r + jnp.clip(step, -width, width)
    return jnp.tan(phi_r), has


def _solve_basis(basis4):
    """Solve for E candidates over one (possibly remixed) null basis.

    basis4: (4, 3, 3) rows X, Y, Z, W. Returns E (R, 3, 3), valid (R,)."""
    X, Y, Z, W = basis4[0], basis4[1], basis4[2], basis4[3]
    C = _coefficient_matrices(X, Y, Z, W)
    z, has = _find_roots(C, basis4.dtype)

    Cz = (C[0][None] + C[1][None] * z[:, None, None]
          + C[2][None] * z[:, None, None] ** 2
          + C[3][None] * z[:, None, None] ** 3)
    # Null vector of Cz by shifted inverse iteration on the normal
    # equations (batched 10x10 SVD is far more expensive on TPU than a
    # Cholesky + 2 solves; at a bisected root the smallest eigenvalue of
    # A = Cz^T Cz is ~0, so two iterations reach the null space).
    Czn = Cz / jnp.maximum(
        jnp.linalg.norm(Cz, axis=(-2, -1), keepdims=True), 1e-30)
    A = jnp.swapaxes(Czn, -1, -2) @ Czn
    # Shift 1e-6: far below the second eigenvalue (O(1e-2..1) for generic
    # 5-point problems), far above the null eigenvalue at a bisected root,
    # and large enough to keep the f32 LU well-posed.
    A = A + 1e-6 * jnp.eye(10, dtype=A.dtype)
    # Two independent start vectors (a single fixed start can be nearly
    # orthogonal to the null vector and silently fail the resid<1e-3
    # validity filter below). Invert A ONCE (one batched Gauss-Jordan
    # pass) and run the iterations as matmuls — a second elimination pass
    # would double the sequential step count of the program.
    m0 = jnp.ones(Cz.shape[:-2] + (10,), Cz.dtype) / jnp.sqrt(10.0)
    m1 = jnp.broadcast_to(jnp.asarray(_START2, Cz.dtype), m0.shape)
    from sara_tpu.ops.smallmat import batched_inv

    Ainv = batched_inv(A)
    M2 = jnp.stack([m0, m1], axis=-1)              # (..., 10, 2)
    for _ in range(2):
        M2 = Ainv @ M2
        M2 = M2 / jnp.maximum(
            jnp.linalg.norm(M2, axis=-2, keepdims=True), 1e-30)
    # Pick per root the start whose iterate is closest to the null space.
    r2 = jnp.linalg.norm(Czn @ M2, axis=-2)        # (..., 2)
    m = jnp.take_along_axis(
        M2, jnp.argmin(r2, axis=-1)[..., None, None], axis=-1)[..., 0]
    w_m = m[:, 9]
    w_safe = jnp.where(jnp.abs(w_m) < 1e-10, 1e-10, w_m)
    x = m[:, 7] / w_safe
    y = m[:, 8] / w_safe

    # Gauss-Newton polish of (x, y, z) on the 10 essential constraints.
    # Near-singular pencils (the resultant can be tiny for EVERY z) make
    # the inverse-iteration null vector lock onto a z-independent global
    # near-kernel; measured on a Monte-Carlo oracle this lost ~18% of the
    # true solutions. Three damped GN steps on the scale-invariant
    # constraint residual recover them (and sharpen every other root).
    def _resid_p(p):
        Ep = p[0] * X + p[1] * Y + p[2] * Z + W
        Ep = Ep / jnp.maximum(jnp.linalg.norm(Ep), 1e-12)
        return _constraints(Ep)

    def _gn_step(p):
        r = _resid_p(p)
        J = jax.jacfwd(_resid_p)(p)                   # (10, 3)
        JtJ = J.T @ J + 1e-10 * jnp.eye(3, dtype=p.dtype)
        g = J.T @ r
        from sara_tpu.features.dog import _solve3

        # _solve3 takes flat symmetric components (hss, hyy, hxx, hsy,
        # hsx, hyx).
        dp = -_solve3((JtJ[0, 0], JtJ[1, 1], JtJ[2, 2],
                       JtJ[0, 1], JtJ[0, 2], JtJ[1, 2]), g)
        p2 = p + jnp.clip(dp, -0.5, 0.5)
        # Accept only improving steps (branch-free).
        better = (jnp.linalg.norm(_resid_p(p2))
                  < jnp.linalg.norm(r))
        return jnp.where(better, p2, p)

    p0 = jnp.stack([x, y, z], axis=-1)                # (R, 3)
    polish = jax.vmap(lambda p: _gn_step(_gn_step(_gn_step(p))))
    p_fin = polish(p0)
    x, y, z = p_fin[:, 0], p_fin[:, 1], p_fin[:, 2]

    E = (x[:, None, None] * X + y[:, None, None] * Y
         + z[:, None, None] * Z + W)
    En = E / jnp.maximum(
        jnp.linalg.norm(E.reshape(E.shape[0], -1), axis=-1), 1e-12
    )[:, None, None]
    resid = jnp.linalg.norm(_constraints(En), axis=-1)
    valid = has & (jnp.abs(w_m) > 1e-8) & (resid < 1e-3)
    return En, valid, resid


def five_point_essential(u: jnp.ndarray, v: jnp.ndarray,
                         n_remix: int = _N_REMIX):
    """Essential matrices from 5 normalized correspondences.

    Args:
      u, v: (5, 2) camera-normalized correspondences (K^-1 applied), with the
        epipolar convention v^T E u = 0.
      n_remix: basis remixes to search (static). The default holds the
        >=99% Monte-Carlo recovery gate; a RANSAC *fast pass* that falls
        back to full strength on rejection can run 2 (each remix is ~25%
        of the solver's cost; per-hypothesis recovery stays ~97%).

    Returns:
      E: (MAX_SOLUTIONS, 3, 3) candidates (Frobenius-normalized).
      valid: (MAX_SOLUTIONS,) bool mask.
    """
    dtype = u.dtype
    ux, uy = u[..., 0], u[..., 1]
    vx, vy = v[..., 0], v[..., 1]
    one = jnp.ones_like(ux)
    A = jnp.stack([vx * ux, vx * uy, vx, vy * ux, vy * uy, vy,
                   ux, uy, one], axis=-1)  # (5, 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    basis = Vt[-4:].reshape(4, 3, 3)  # rows: X, Y, Z, W

    Q = jnp.asarray(_REMIXES[:max(1, min(n_remix, _N_REMIX))], dtype)
    mixed = jnp.einsum("rij,jab->riab", Q, basis)
    E_all, valid_all, resid_all = jax.vmap(_solve_basis)(mixed)
    E_flat = E_all.reshape(-1, 3, 3)
    valid_flat = valid_all.reshape(-1)
    resid_flat = resid_all.reshape(-1)

    # Greedy dedup: remixes re-find the same roots, so a plain top-k would
    # fill all slots with copies of the best-conditioned one. Select by
    # (validity, -residual) while suppressing near-duplicates (sign-invariant
    # Frobenius distance of the normalized E's).
    diff = jnp.minimum(
        jnp.linalg.norm((E_flat[:, None] - E_flat[None, :]).reshape(
            E_flat.shape[0], E_flat.shape[0], 9), axis=-1),
        jnp.linalg.norm((E_flat[:, None] + E_flat[None, :]).reshape(
            E_flat.shape[0], E_flat.shape[0], 9), axis=-1),
    )
    score = jnp.where(valid_flat, -resid_flat, -jnp.inf)

    def pick(k, state):
        score, keep, keep_valid = state
        i = jnp.argmax(score).astype(jnp.int32)
        ok = score[i] > -jnp.inf
        keep = keep.at[k].set(i)
        keep_valid = keep_valid.at[k].set(ok)
        score = jnp.where(diff[i] < 1e-3, -jnp.inf, score)
        return score, keep, keep_valid

    keep0 = jnp.zeros((MAX_SOLUTIONS,), jnp.int32)
    kv0 = jnp.zeros((MAX_SOLUTIONS,), bool)
    _, keep, keep_valid = jax.lax.fori_loop(0, MAX_SOLUTIONS, pick,
                                            (score, keep0, kv0))
    return E_flat[keep], keep_valid
