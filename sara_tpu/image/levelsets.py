"""Level sets: signed distance by fast sweeping (eikonal solver).

TPU-native replacement for the reference's fast-marching level-set tools
(reference: cpp/src/DO/Sara/ImageProcessing/LevelSets/FastMarching.hpp).
Fast *marching* is a priority-queue algorithm (hostile to SIMD); fast
*sweeping* solves the same eikonal equation |grad u| = f with a fixed number
of directional Gauss-Seidel sweeps — each sweep is a ``lax.scan`` over rows,
vectorized across columns, which XLA pipelines well on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e10


def _eikonal_update(u_x, u_y, f):
    """Godunov eikonal update from axis-neighbor minima (unit grid)."""
    a = jnp.minimum(u_x, u_y)
    b = jnp.maximum(u_x, u_y)
    # 1-D update if the difference is large, else 2-D quadratic solution.
    one_d = a + f
    disc = 2.0 * f * f - (u_x - u_y) ** 2
    two_d = 0.5 * (u_x + u_y + jnp.sqrt(jnp.maximum(disc, 0.0)))
    return jnp.where(one_d <= b, one_d, two_d)


def _sweep_rows(u, f, reverse_rows: bool, reverse_cols: bool):
    """One directional sweep: scan rows top->bottom (or reversed), each row
    updated from the previously-swept row and the column-neighbor minima."""
    if reverse_cols:
        u = u[:, ::-1]
        f = f[:, ::-1]
    if reverse_rows:
        u = u[::-1]
        f = f[::-1]

    H, W = u.shape

    def row_step(prev_row, inputs):
        u_row, f_row = inputs
        # Column-direction neighbor minima within the row: prefix min via
        # associative scan on (value + distance) is approximated by a few
        # shifted-min iterations (exact for smooth fronts).
        left = jnp.concatenate([jnp.array([_BIG], u.dtype), u_row[:-1]])
        right = jnp.concatenate([u_row[1:], jnp.array([_BIG], u.dtype)])
        ux = jnp.minimum(left, right)
        new = jnp.minimum(u_row, _eikonal_update(ux, prev_row, f_row))
        # One Gauss-Seidel refinement inside the row.
        left = jnp.concatenate([jnp.array([_BIG], u.dtype), new[:-1]])
        right = jnp.concatenate([new[1:], jnp.array([_BIG], u.dtype)])
        ux = jnp.minimum(left, right)
        new = jnp.minimum(new, _eikonal_update(ux, prev_row, f_row))
        return new, new

    init = jnp.full((W,), _BIG, u.dtype)
    _, rows = jax.lax.scan(row_step, init, (u, f))
    out = rows
    if reverse_rows:
        out = out[::-1]
    if reverse_cols:
        out = out[:, ::-1]
    return out


@functools.partial(jax.jit, static_argnames=("num_sweeps",))
def fast_sweeping_distance(seed_mask: jnp.ndarray, speed=None,
                           num_sweeps: int = 4):
    """Distance transform from seed pixels by fast sweeping.

    seed_mask: (H, W) bool — the zero level set. speed: optional (H, W)
    slowness f (default 1 -> euclidean-like distance). Returns (H, W) u.
    """
    H, W = seed_mask.shape
    f = jnp.ones((H, W), jnp.float32) if speed is None else speed
    u = jnp.where(seed_mask, 0.0, _BIG)

    def one_round(_, u):
        for rr in (False, True):
            for rc in (False, True):
                u = _sweep_rows(u, f, rr, rc)
        return u

    return jax.lax.fori_loop(0, num_sweeps, one_round, u)


def signed_distance(mask: jnp.ndarray, num_sweeps: int = 4):
    """Signed distance to the boundary of a binary region (positive outside)."""
    m = mask
    boundary = m & ~(
        jnp.roll(m, 1, 0) & jnp.roll(m, -1, 0)
        & jnp.roll(m, 1, 1) & jnp.roll(m, -1, 1))
    d = fast_sweeping_distance(boundary, num_sweeps=num_sweeps)
    return jnp.where(mask, -d, d)
