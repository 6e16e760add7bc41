"""Deriche recursive (IIR) Gaussian smoothing.

TPU-native rebuild of the reference's Deriche filter
(reference: cpp/src/DO/Sara/ImageProcessing/Deriche.hpp) — an O(1)-per-pixel
smoother whose cost is independent of sigma, the right choice for very large
blur radii where FIR taps get long.

The 2nd-order recursive filter runs as a ``lax.scan`` along each axis
(causal + anticausal passes), vectorized across the other axis — XLA
pipelines the scan across the 128-lane dimension.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def _deriche_coeffs(sigma: float, dtype):
    """Deriche's 2nd-order smoothing coefficients."""
    alpha = 1.695 / float(sigma)
    ea = math.exp(-alpha)
    e2a = math.exp(-2.0 * alpha)
    k = (1.0 - ea) ** 2 / (1.0 + 2.0 * alpha * ea - e2a)
    # Causal: y[n] = a0 x[n] + a1 x[n-1] + b1 y[n-1] + b2 y[n-2]
    a0 = k
    a1 = k * ea * (alpha - 1.0)
    b1 = 2.0 * ea
    b2 = -e2a
    # Anticausal: y[n] = c1 x[n+1] + c2 x[n+2] + b1 y[n+1] + b2 y[n+2]
    c1 = k * ea * (alpha + 1.0)
    c2 = -k * e2a
    return tuple(jnp.asarray(v, dtype) for v in (a0, a1, b1, b2, c1, c2))


def _iir_pass(x: jnp.ndarray, a0, a1, b1, b2):
    """Causal pass along axis 0 of (N, M): scan rows, vector lanes in M."""

    def step(carry, xn):
        y1, y2, x1 = carry
        y = a0 * xn + a1 * x1 + b1 * y1 + b2 * y2
        return (y, y1, xn), y

    init = (jnp.zeros_like(x[0]), jnp.zeros_like(x[0]), jnp.zeros_like(x[0]))
    _, ys = jax.lax.scan(step, init, x)
    return ys


def _anticausal_pass(x: jnp.ndarray, c1, c2, b1, b2):
    def step(carry, xn):
        y1, y2, x1, x2 = carry
        y = c1 * x1 + c2 * x2 + b1 * y1 + b2 * y2
        return (y, y1, xn, x1), y

    z = jnp.zeros_like(x[0])
    _, ys = jax.lax.scan(step, (z, z, z, z), x[::-1])
    return ys[::-1]


@functools.partial(jax.jit, static_argnames=("sigma",))
def deriche_blur(image: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Deriche-smoothed image, separable in x then y. sigma is static.

    Borders are edge-replicated by ~4 sigma before each pass so the IIR
    warm-up transient (the filter starts from zero state) stays outside the
    output.
    """
    a0, a1, b1, b2, c1, c2 = _deriche_coeffs(sigma, image.dtype)
    pad = int(4 * float(sigma)) + 4

    def smooth_axis0(x):
        xp = jnp.concatenate([jnp.repeat(x[:1], pad, axis=0), x,
                              jnp.repeat(x[-1:], pad, axis=0)], axis=0)
        y = (_iir_pass(xp, a0, a1, b1, b2)
             + _anticausal_pass(xp, c1, c2, b1, b2))
        return y[pad:-pad]

    y = smooth_axis0(image)          # rows (axis 0)
    y = smooth_axis0(y.T).T          # cols
    return y
