"""Batched polynomial root finding, designed for TPU.

TPU-native replacement for the reference's univariate polynomial machinery
(reference: cpp/src/DO/Sara/Core/Math/UnivariatePolynomial.hpp,
JenkinsTraub.cpp, PolynomialRoots.hpp).

Design note: XLA on TPU has no nonsymmetric eigensolver, so the classic
"companion matrix + eig" root finder is unavailable on device. Instead we
find *real* roots — the only ones the minimal solvers need — with a fully
vectorized bracket-and-bisect scheme:

  1. Fujiwara bound B on root magnitudes from the coefficients,
  2. evaluate the polynomial on a fixed uniform grid over [-B, B],
  3. detect sign changes -> up to ``max_roots`` brackets (fixed capacity),
  4. bisection (fixed iterations) + Newton polish.

Every step is branch-free and vmaps over hypothesis batches; invalid root
slots carry ``mask = False``. Quadratics/cubics use closed forms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def polyval(coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Evaluate polynomial with ``coeffs`` (..., n+1), highest degree first.

    Horner scheme; broadcasts coeffs against x over leading dims.
    """
    acc = jnp.zeros_like(x) + coeffs[..., 0]
    for i in range(1, coeffs.shape[-1]):
        acc = acc * x + coeffs[..., i]
    return acc


def polyder(coeffs: jnp.ndarray) -> jnp.ndarray:
    """Derivative coefficients (highest degree first)."""
    n = coeffs.shape[-1] - 1
    powers = jnp.arange(n, 0, -1, dtype=coeffs.dtype)
    return coeffs[..., :-1] * powers


def real_roots_bracketed(
    coeffs: jnp.ndarray,
    max_roots: int,
    grid_size: int = 128,
    bisect_iters: int = 40,
    newton_iters: int = 2,
):
    """Real roots of a batch of polynomials, fixed output capacity.

    Args:
      coeffs: (..., n+1) coefficients, highest degree first. The leading
        coefficient may be (near) zero; it is regularized.
      max_roots: static capacity of the returned root array.
      grid_size: number of initial samples (static).
      bisect_iters / newton_iters: static iteration counts.

    Returns:
      roots: (..., max_roots) float array.
      valid: (..., max_roots) bool mask.
    """
    dtype = coeffs.dtype
    lead = coeffs[..., :1]
    lead = jnp.where(jnp.abs(lead) < 1e-12, 1e-12, lead)
    c = coeffs / lead  # monic-ish; same roots.

    # Fujiwara bound: 2 * max_i |a_i|^(1/i) for monic polynomials — far
    # tighter than the Cauchy bound, which would waste the sample grid on
    # root-free space for the large coefficients of resultant polynomials.
    n = c.shape[-1] - 1
    inv_i = 1.0 / jnp.arange(1, n + 1, dtype=dtype)
    # Halve the constant term per Fujiwara's statement.
    mags = jnp.abs(c[..., 1:])
    mags = mags.at[..., -1].mul(0.5)
    bound = 2.0 * jnp.max(mags ** inv_i, axis=-1)
    bound = jnp.maximum(bound, 1e-6)

    # Uniform grid over [-B, B].
    k = jnp.arange(grid_size, dtype=dtype)
    u = 2.0 * k / (grid_size - 1) - 1.0  # [-1, 1]
    xs = bound[..., None] * u  # (..., G)
    ys = polyval(c[..., None, :], xs)

    # Sign changes between consecutive samples give root brackets.
    s = jnp.sign(ys)
    change = (s[..., :-1] * s[..., 1:]) < 0  # (..., G-1)
    # Exact zeros on grid points also count (rare).
    change = change | (ys[..., :-1] == 0)

    # Select up to max_roots bracket indices: use top_k on a score that is
    # -inf where there is no sign change, otherwise the (negated) position so
    # brackets come out in ascending-x order after a final sort.
    score = jnp.where(change, 1.0, 0.0)
    # top_k over the bracket axis
    _, idx = jax.lax.top_k(score, max_roots)  # (..., max_roots)
    has = jnp.take_along_axis(change, idx, axis=-1)

    lo = jnp.take_along_axis(xs, idx, axis=-1)
    hi = jnp.take_along_axis(xs, idx + 1, axis=-1)
    flo = polyval(c[..., None, :], lo)

    def bisect_body(_, state):
        lo, hi, flo = state
        mid = 0.5 * (lo + hi)
        fmid = polyval(c[..., None, :], mid)
        go_left = (flo * fmid) <= 0
        lo2 = jnp.where(go_left, lo, mid)
        hi2 = jnp.where(go_left, mid, hi)
        flo2 = jnp.where(go_left, flo, fmid)
        return lo2, hi2, flo2

    lo, hi, flo = jax.lax.fori_loop(0, bisect_iters, bisect_body, (lo, hi, flo))
    roots = 0.5 * (lo + hi)

    dc = polyder(c)
    for _ in range(newton_iters):
        f = polyval(c[..., None, :], roots)
        df = polyval(dc[..., None, :], roots)
        step = f / jnp.where(jnp.abs(df) < 1e-12, 1e-12, df)
        # Keep Newton inside the bracket; otherwise reject the step.
        cand = roots - step
        ok = (cand >= lo) & (cand <= hi)
        roots = jnp.where(ok, cand, roots)

    return roots, has


def roots_quadratic(a, b, c):
    """Real roots of a x^2 + b x + c. Returns (roots (...,2), valid (...,2))."""
    disc = b * b - 4.0 * a * c
    ok = disc >= 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    # Numerically stable: q = -(b + sign(b) sqrt(disc)) / 2
    q = -0.5 * (b + jnp.where(b >= 0, sq, -sq))
    a_safe = jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
    q_safe = jnp.where(jnp.abs(q) < 1e-12, 1e-12, q)
    r1 = q / a_safe
    r2 = c / q_safe
    roots = jnp.stack([r1, r2], axis=-1)
    valid = jnp.stack([ok, ok & (jnp.abs(q) > 1e-12)], axis=-1)
    return roots, valid


def roots_cubic_single_real(a, b, c, d):
    """One guaranteed real root of a x^3 + b x^2 + c x + d (batched).

    Uses the trigonometric/hyperbolic (Cardano) method, branch-free. A cubic
    with real coefficients always has at least one real root; this returns it.
    Used by Lambda-Twist P3P (reference: PnP/LambdaTwist.hpp:92-151).
    """
    a_safe = jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
    p = b / a_safe
    q = c / a_safe
    r = d / a_safe
    # Depressed cubic t^3 + pt t + qt with x = t - p/3.
    pt = q - p * p / 3.0
    qt = 2.0 * p ** 3 / 27.0 - p * q / 3.0 + r
    disc = (qt / 2.0) ** 2 + (pt / 3.0) ** 3

    # Case disc >= 0: one real root via Cardano.
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u = jnp.cbrt(-qt / 2.0 + sq)
    v = jnp.cbrt(-qt / 2.0 - sq)
    t_card = u + v

    # Case disc < 0: three real roots; take the largest via trigonometric form.
    pt_neg = jnp.minimum(pt, -1e-12)
    m = 2.0 * jnp.sqrt(-pt_neg / 3.0)
    arg = jnp.clip(3.0 * qt / (pt_neg * m), -1.0, 1.0)
    theta = jnp.arccos(arg) / 3.0
    t_trig = m * jnp.cos(theta)

    t = jnp.where(disc >= 0, t_card, t_trig)
    return t - p / 3.0


def roots_cubic(a, b, c, d, polish_iters: int = 2):
    """All real roots of a cubic. Returns (roots (...,3), valid (...,3))."""
    x0 = roots_cubic_single_real(a, b, c, d)
    # Deflate: a x^3 + ... = (x - x0)(a x^2 + B x + C)
    B = b + a * x0
    C = c + B * x0
    r, v = roots_quadratic(a, B, C)
    roots = jnp.concatenate([x0[..., None], r], axis=-1)
    valid = jnp.concatenate([jnp.ones_like(x0[..., None], bool), v], axis=-1)
    # Newton polish on the original cubic.
    for _ in range(polish_iters):
        f = ((a[..., None] * roots + b[..., None]) * roots + c[..., None]) * roots + d[..., None]
        df = (3 * a[..., None] * roots + 2 * b[..., None]) * roots + c[..., None]
        df = jnp.where(jnp.abs(df) < 1e-12, 1e-12, df)
        roots = roots - f / df
    return roots, valid


def companion_matrix(coeffs: jnp.ndarray) -> jnp.ndarray:
    """Companion matrix of a (monic-normalized) polynomial, batched.

    Provided for CPU-side verification (nonsymmetric eig is not available on
    TPU; device code uses :func:`real_roots_bracketed`).
    """
    n = coeffs.shape[-1] - 1
    lead = coeffs[..., :1]
    lead = jnp.where(jnp.abs(lead) < 1e-12, 1e-12, lead)
    c = coeffs / lead
    batch = coeffs.shape[:-1]
    comp = jnp.zeros(batch + (n, n), coeffs.dtype)
    comp = comp.at[..., 1:, :-1].set(jnp.broadcast_to(jnp.eye(n - 1, dtype=coeffs.dtype), batch + (n - 1, n - 1)))
    comp = comp.at[..., 0, :].set(-c[..., 1:])
    return comp
