"""Segmentation / thresholding: Otsu, adaptive threshold, watershed, CCL.

TPU-native rebuild of the reference's segmentation tools
(reference: cpp/src/DO/Sara/ImageProcessing/Otsu.hpp,
AdaptiveBinaryThresholding.hpp, Watershed.hpp / WatershedV2.hpp,
DisjointSets/TwoPassConnectedComponents.hpp).

Watershed is expressed as fixed-iteration marker flooding (iterated masked
neighborhood label propagation ordered by image value) — the data-dependent
priority queue of the reference becomes a jit-friendly stencil iteration.
Connected-component labeling runs on device via the same propagation trick.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sara_tpu.image.filtering import box_blur, gaussian_blur


def otsu_threshold(image: jnp.ndarray, bins: int = 256):
    """Otsu's optimal global threshold of a float image in [0, 1].

    Returns (threshold (scalar), binary mask)."""
    x = jnp.clip(image, 0.0, 1.0)
    hist = jnp.histogram(x.reshape(-1), bins=bins, range=(0.0, 1.0))[0]
    hist = hist.astype(jnp.float32)
    p = hist / jnp.maximum(jnp.sum(hist), 1.0)
    centers = (jnp.arange(bins, dtype=jnp.float32) + 0.5) / bins
    w0 = jnp.cumsum(p)
    mu = jnp.cumsum(p * centers)
    mu_t = mu[-1]
    w1 = 1.0 - w0
    var_between = (mu_t * w0 - mu) ** 2 / jnp.maximum(w0 * w1, 1e-12)
    # The variance is flat across empty histogram gaps; take the plateau
    # midpoint like standard implementations.
    m = jnp.max(var_between)
    sel = (var_between >= m * (1.0 - 1e-6)).astype(jnp.float32)
    thr = jnp.sum(centers * sel) / jnp.maximum(jnp.sum(sel), 1.0)
    return thr, image > thr


def adaptive_threshold(image: jnp.ndarray, radius: int = 15,
                       offset: float = 0.02):
    """Binary mask: pixel > local box mean - offset
    (reference: AdaptiveBinaryThresholding.hpp)."""
    local_mean = box_blur(image, radius)
    return image > (local_mean - offset)


def _shift2(a: jnp.ndarray, dy: int, dx: int, fill):
    """Non-wrapping 2-D shift (jnp.roll would wrap labels across borders)."""
    H, W = a.shape
    out = jnp.full_like(a, fill)
    ys = slice(max(dy, 0), H + min(dy, 0))
    xs = slice(max(dx, 0), W + min(dx, 0))
    ys_src = slice(max(-dy, 0), H + min(-dy, 0))
    xs_src = slice(max(-dx, 0), W + min(-dx, 0))
    return out.at[ys, xs].set(a[ys_src, xs_src])


def _neighbor_max(a: jnp.ndarray, fill) -> jnp.ndarray:
    m = a
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            m = jnp.maximum(m, _shift2(a, dy, dx, fill))
    return m


def _propagate_labels(labels: jnp.ndarray, allowed: jnp.ndarray, iters: int):
    """Iterated 8-neighbor max-label propagation restricted to a mask."""

    def body(_, lab):
        m = _neighbor_max(lab, 0)
        return jnp.where(allowed, m, lab)

    return jax.lax.fori_loop(0, iters, body, labels)


@functools.partial(jax.jit, static_argnames=("iters",))
def label_connected_components(mask: jnp.ndarray, iters: int = 256):
    """Device-side CCL of a binary mask: unique positive label per component
    (0 = background). Exact once ``iters`` >= component diameter."""
    H, W = mask.shape
    seed = (jnp.arange(H * W, dtype=jnp.int32).reshape(H, W) + 1)
    labels = jnp.where(mask, seed, 0)
    return _propagate_labels(labels, mask, iters)


@functools.partial(jax.jit, static_argnames=("levels", "iters_per_level"))
def watershed(image: jnp.ndarray, markers: jnp.ndarray, levels: int = 64,
              iters_per_level: int = 8):
    """Marker-based watershed by level flooding.

    image: (H, W) relief (float in [0,1]); markers: (H, W) int32 labels
    (>0 seeds, 0 unknown). Floods markers outward level by level (ascending
    relief), which reproduces the reference watershed's basin assignment.
    """
    x = jnp.clip(image, 0.0, 1.0)
    labels = markers

    # Propagation must not overwrite existing labels; only unlabeled pixels
    # under the current flood level may take a neighboring label.
    def flood_fixed(level, lab):
        thr = (level + 1.0) / levels
        allowed = x <= thr

        def body(_, l):
            m = _neighbor_max(l, 0)
            grow = (l == 0) & allowed
            return jnp.where(grow, m, l)

        return jax.lax.fori_loop(0, iters_per_level, body, lab)

    labels = jax.lax.fori_loop(0, levels, flood_fixed, labels)
    return labels
