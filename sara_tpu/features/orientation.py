"""Dominant gradient orientation assignment.

TPU-native rebuild of the reference's orientation histogram stage
(reference: cpp/src/DO/Sara/FeatureDescriptors/Orientation.hpp:149-260 —
36-bin Gaussian-weighted histogram over a radius 3*(1.5 sigma) patch, 6x
circular box-3 "Lowe" smoothing, peaks >= 0.8 * max with parabolic
refinement; cf. the GPU formulation in
Shakti/Halide/Generators/DominantGradientOrientationsGeneratorV2.cpp).

Vectorization strategy: every keypoint gathers a fixed-size window from its
(nearest) scale's gradient maps; histogram accumulation is a static loop over
the 36 bins with masked sums (no scatters), which XLA fuses into one pass.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

NUM_BINS = 36


def _gather_patches(stack: jnp.ndarray, s_idx, yc, xc, radius: int):
    """Gather (2R+1)^2 windows at integer centers from per-scale maps.

    stack: (S, H, W); s_idx, yc, xc: (K,) int32. Returns (K, P, P).
    """
    S, H, W = stack.shape
    offs = jnp.arange(-radius, radius + 1)
    yy = yc[:, None] + offs  # (K, P)
    xx = xc[:, None] + offs
    yyc = jnp.clip(yy, 0, H - 1)
    xxc = jnp.clip(xx, 0, W - 1)
    patch = stack[s_idx[:, None, None], yyc[:, :, None], xxc[:, None, :]]
    inside = ((yy >= 0) & (yy < H))[:, :, None] & ((xx >= 0) & (xx < W))[:, None, :]
    return patch, inside


def orientation_histograms(mag: jnp.ndarray, ori: jnp.ndarray,
                           x, y, s, sigmas, radius_factor: float = 1.5,
                           max_sigma: float | None = None):
    """36-bin weighted orientation histograms for K keypoints.

    Args:
      mag, ori: (S, H, W) gradient magnitude / orientation stacks (octave).
      x, y: (K,) refined positions (octave pixel coords).
      s: (K,) continuous scale index.
      sigmas: per-scale absolute sigmas within the octave (tuple of floats).
      radius_factor: patch sigma = radius_factor * keypoint sigma.

    Returns hist: (K, 36).
    """
    S = mag.shape[0]
    if max_sigma is None:
        max_sigma = max(sigmas)
    radius = int(math.ceil(3.0 * radius_factor * max_sigma))

    s_idx = jnp.clip(jnp.round(s).astype(jnp.int32), 0, S - 1)
    yc = jnp.round(y).astype(jnp.int32)
    xc = jnp.round(x).astype(jnp.int32)
    m, inside = _gather_patches(mag, s_idx, yc, xc, radius)
    o, _ = _gather_patches(ori, s_idx, yc, xc, radius)

    sig_table = jnp.asarray(sigmas, jnp.float32)
    sigma = sig_table[s_idx]  # (K,)
    w_sigma = radius_factor * sigma

    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    # Sub-pixel-correct squared distance from the refined center.
    dy = offs[None, :, None] - (y - yc.astype(jnp.float32))[:, None, None]
    dx = offs[None, None, :] - (x - xc.astype(jnp.float32))[:, None, None]
    r2 = dy * dy + dx * dx
    w = jnp.exp(-r2 / (2.0 * (w_sigma ** 2)[:, None, None]))
    lim = (3.0 * w_sigma) ** 2
    w = jnp.where((r2 <= lim[:, None, None]) & inside, w, 0.0) * m

    # Orientation bin in [0, 36).
    two_pi = 2.0 * jnp.pi
    frac = jnp.mod(o, two_pi) / two_pi * NUM_BINS
    b = jnp.floor(frac).astype(jnp.int32) % NUM_BINS

    hist = jnp.stack(
        [jnp.sum(jnp.where(b == k, w, 0.0), axis=(1, 2)) for k in range(NUM_BINS)],
        axis=-1,
    )
    return hist


def lowe_smooth(hist: jnp.ndarray, iters: int = 6) -> jnp.ndarray:
    """Circular box-3 smoothing, 6 iterations (reference:
    Orientation.hpp:205-222)."""
    for _ in range(iters):
        hist = (jnp.roll(hist, 1, axis=-1) + hist + jnp.roll(hist, -1, axis=-1)) / 3.0
    return hist


def find_orientation_peaks(hist: jnp.ndarray, max_peaks: int = 3,
                           peak_ratio: float = 0.8):
    """Local maxima >= peak_ratio * global max, parabola-refined.

    Returns (orientations (K, max_peaks) radians in (-pi, pi], valid mask).
    (reference: Orientation.hpp find_peaks / refine_peak, :174-213)
    """
    left = jnp.roll(hist, 1, axis=-1)
    right = jnp.roll(hist, -1, axis=-1)
    gmax = jnp.max(hist, axis=-1, keepdims=True)
    is_peak = (hist > left) & (hist > right) & (hist >= peak_ratio * gmax) & (gmax > 0)

    import jax

    score = jnp.where(is_peak, hist, -1.0)
    vals, idx = jax.lax.top_k(score, max_peaks)
    valid = vals > 0

    hl = jnp.take_along_axis(left, idx, axis=-1)
    hc = jnp.take_along_axis(hist, idx, axis=-1)
    hr = jnp.take_along_axis(right, idx, axis=-1)
    denom = hl - 2.0 * hc + hr
    offset = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (hl - hr) / denom, 0.0)
    bin_f = idx.astype(jnp.float32) + offset + 0.5
    theta = bin_f / NUM_BINS * (2.0 * jnp.pi)
    theta = jnp.mod(theta + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    return theta, valid


def dominant_orientations(mag, ori, x, y, s, sigmas, max_peaks: int = 3):
    """Full pipeline: histogram -> smooth -> peaks."""
    hist = orientation_histograms(mag, ori, x, y, s, sigmas)
    hist = lowe_smooth(hist)
    return find_orientation_peaks(hist, max_peaks)
