"""Generic ADMM for consensus-form convex problems.

Rebuild of the reference's Python optimization note
(reference: python/oddkiva/sara/optimization/admm.py — "reused in the C++
code" per python/oddkiva/sara/sfm/README.md). Solves

    min f(x) + g(z)   s.t.  A x + B z = c

by scaled-form ADMM with user-supplied proximal operators; everything is
jnp so the iterations jit/vmap.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class ADMMState(NamedTuple):
    x: jnp.ndarray
    z: jnp.ndarray
    u: jnp.ndarray  # scaled dual
    primal_res: jnp.ndarray
    dual_res: jnp.ndarray


def admm(prox_f: Callable, prox_g: Callable, A: jnp.ndarray, B: jnp.ndarray,
         c: jnp.ndarray, x0: jnp.ndarray, z0: jnp.ndarray,
         rho: float = 1.0, iters: int = 100) -> ADMMState:
    """Scaled-form ADMM.

    prox_f(v, rho): argmin_x f(x) + rho/2 ||A x - v||^2
    prox_g(v, rho): argmin_z g(z) + rho/2 ||B z - v||^2
    """
    u0 = jnp.zeros_like(c)

    def step(state, _):
        x, z, u, _, _ = state
        x_new = prox_f(c - B @ z - u, rho)
        z_new = prox_g(c - A @ x_new - u, rho)
        r = A @ x_new + B @ z_new - c
        u_new = u + r
        s = rho * (B @ (z_new - z))
        st = ADMMState(x_new, z_new, u_new,
                       jnp.linalg.norm(r), jnp.linalg.norm(s))
        return st, None

    init = ADMMState(x0, z0, u0, jnp.asarray(jnp.inf), jnp.asarray(jnp.inf))
    out, _ = jax.lax.scan(step, init, None, length=iters)
    return out


def lasso(Amat: jnp.ndarray, b: jnp.ndarray, lam: float,
          rho: float = 1.0, iters: int = 200) -> jnp.ndarray:
    """l1-regularized least squares via ADMM (the classic example):
    min 1/2 ||A x - b||^2 + lam ||x||_1."""
    n = Amat.shape[1]
    AtA = Amat.T @ Amat
    Atb = Amat.T @ b
    L = jnp.linalg.cholesky(AtA + rho * jnp.eye(n))

    def solve(v):
        y = jax.scipy.linalg.solve_triangular(L, v, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

    def shrink(v, k):
        return jnp.sign(v) * jnp.maximum(jnp.abs(v) - k, 0.0)

    def step(state, _):
        x, z, u = state
        x = solve(Atb + rho * (z - u))
        z = shrink(x + u, lam / rho)
        u = u + x - z
        return (x, z, u), None

    x0 = jnp.zeros(n)
    (x, z, u), _ = jax.lax.scan(step, (x0, x0, x0), None, length=iters)
    return z
