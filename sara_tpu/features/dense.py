"""Dense SIFT: descriptors on a regular grid.

TPU-native rebuild of the reference's dense features
(reference: cpp/src/DO/Sara/FeatureDescriptors/DenseFeature.hpp). Reuses the
vectorized descriptor program over a grid of synthetic keypoints — on TPU
this is simply a bigger vmap batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sara_tpu.features.sift import sift_descriptors
from sara_tpu.image.differential import gradient
from sara_tpu.image.filtering import gaussian_blur


@functools.partial(jax.jit, static_argnames=("step", "sigma"))
def dense_sift(image: jnp.ndarray, step: int = 8, sigma: float = 1.6):
    """128-D descriptors on a regular grid (upright, fixed scale).

    Returns (xy (N, 2), descriptors (N, 128)) with N = len(grid).
    """
    H, W = image.shape
    sm = gaussian_blur(image, sigma)
    gx, gy = gradient(sm)
    ys = jnp.arange(step, H - step, step, dtype=jnp.float32)
    xs = jnp.arange(step, W - step, step, dtype=jnp.float32)
    xx, yy = jnp.meshgrid(xs, ys)
    x = xx.reshape(-1)
    y = yy.reshape(-1)
    n = x.shape[0]
    s = jnp.zeros((n,), jnp.float32)
    theta = jnp.zeros((n,), jnp.float32)
    desc = sift_descriptors(gx[None], gy[None], x, y, s, theta, (sigma,))
    return jnp.stack([x, y], axis=-1), desc
