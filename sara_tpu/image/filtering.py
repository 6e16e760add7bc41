"""Separable convolution and Gaussian filtering.

TPU-native rebuild of the reference's linear filtering
(reference: cpp/src/DO/Sara/ImageProcessing/LinearFiltering.hpp:44-246 —
``convolve_array``, ``apply_row_based_filter``, ``apply_gaussian_filter``).

Implementation: replicate-pad then two 1-D ``lax.conv_general_dilated``
passes. XLA lowers these onto the TPU convolution path and fuses the
surrounding elementwise work; a Pallas kernel exists for the pyramid hot loop
(see ``sara_tpu.ops``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax


def gaussian_kernel_1d(sigma: float, truncate: float = 4.0, dtype=jnp.float32) -> jnp.ndarray:
    """Normalized 1-D Gaussian taps, radius = ceil(truncate * sigma).

    Matches the reference default truncation factor
    (reference: LinearFiltering.hpp:227-246 uses gauss_truncate=4).
    ``sigma`` must be a static Python float (kernel size is shape-defining).
    """
    radius = max(1, int(math.ceil(truncate * float(sigma))))
    x = jnp.arange(-radius, radius + 1, dtype=dtype)
    k = jnp.exp(-(x * x) / (2.0 * float(sigma) ** 2))
    return k / jnp.sum(k)


def _as_nchw(image: jnp.ndarray):
    """(H,W) | (B,H,W) -> (N,1,H,W) plus a function restoring the shape."""
    shape = image.shape
    if image.ndim == 2:
        x = image[None, None]
        restore = lambda y: y[0, 0]
    elif image.ndim == 3:
        x = image[:, None]
        restore = lambda y: y[:, 0]
    else:
        lead = shape[:-2]
        x = image.reshape((-1, 1) + shape[-2:])
        restore = lambda y: y.reshape(lead + y.shape[-2:])
    return x, restore


def separable_conv2d(image: jnp.ndarray, kx: jnp.ndarray, ky: jnp.ndarray) -> jnp.ndarray:
    """Convolve rows with ``kx`` then columns with ``ky``; replicate borders.

    ``image``: (..., H, W). Kernels are 1-D, odd length.
    """
    x, restore = _as_nchw(image)
    rx = kx.shape[0] // 2
    ry = ky.shape[0] // 2
    x = jnp.pad(x, ((0, 0), (0, 0), (ry, ry), (rx, rx)), mode="edge")
    # Row pass (convolve along W).
    kxf = kx[::-1].reshape(1, 1, 1, -1).astype(x.dtype)
    x = lax.conv_general_dilated(x, kxf, window_strides=(1, 1), padding="VALID")
    # Column pass (convolve along H).
    kyf = ky[::-1].reshape(1, 1, -1, 1).astype(x.dtype)
    x = lax.conv_general_dilated(x, kyf, window_strides=(1, 1), padding="VALID")
    return restore(x)


def conv2d(image: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Dense 2-D convolution with replicate borders. kernel: (kh, kw)."""
    x, restore = _as_nchw(image)
    kh, kw = kernel.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)), mode="edge")
    kf = kernel[::-1, ::-1][None, None].astype(x.dtype)
    x = lax.conv_general_dilated(x, kf, window_strides=(1, 1), padding="VALID")
    return restore(x)


def gaussian_blur(image: jnp.ndarray, sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    """Isotropic Gaussian blur (reference: apply_gaussian_filter)."""
    k = gaussian_kernel_1d(sigma, truncate, dtype=image.dtype)
    return separable_conv2d(image, k, k)


def box_blur(image: jnp.ndarray, radius: int) -> jnp.ndarray:
    n = 2 * radius + 1
    k = jnp.full((n,), 1.0 / n, image.dtype)
    return separable_conv2d(image, k, k)


def sobel(image: jnp.ndarray):
    """Sobel x/y derivatives (reference: LinearFiltering.hpp sobel kernels)."""
    d = jnp.array([-1.0, 0.0, 1.0], image.dtype)
    s = jnp.array([1.0, 2.0, 1.0], image.dtype) / 4.0
    gx = separable_conv2d(image, d, s)
    gy = separable_conv2d(image, s, d)
    return gx, gy
