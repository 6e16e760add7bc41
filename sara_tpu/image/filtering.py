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


def band_matrix(taps, n_in: int, stride: int):
    """(n_in, n_out) banded Toeplitz matrix applying a CORRELATION with
    ``taps`` at output stride ``stride``, with edge-replicated borders:

      out[j] = sum_k taps[k] * in[clip(stride*j + k - R, 0, n_in-1)].

    Built once per (taps, shape) at trace time (numpy) and embedded as a
    constant. The matmul form keeps 1-D blurs on the MXU — TPU lowers
    small-channel 1-D convs to a slow per-channel VPU path (~10x slower,
    NOTES.md).
    """
    import numpy as np

    R = (len(taps) - 1) // 2
    n_out = -(-n_in // stride)
    B = np.zeros((n_in, n_out), np.float32)
    for j in range(n_out):
        for k, t in enumerate(taps):
            i = min(max(stride * j + k - R, 0), n_in - 1)
            B[i, j] += t
    return B


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

    On TPU the two passes run as banded-Toeplitz matmuls on the MXU: 1-D
    convs lower to a slow VPU path there (measured ~10x slower than the
    same blur as a band matmul, NOTES.md). On other backends they stay
    ``lax.conv_general_dilated`` passes.
    """
    import numpy as np

    concrete = not (isinstance(kx, jax.core.Tracer)
                    or isinstance(ky, jax.core.Tracer))
    if jax.default_backend() == "tpu" and concrete:
        # band_matrix correlates; flip taps to convolve (symmetric Gaussian
        # taps are unaffected, derivative-style kernels are not). Taps must
        # be concrete (they are baked into the band-matrix constant); traced
        # kernels fall through to the conv path.
        H, W = image.shape[-2:]
        Bw = jnp.asarray(band_matrix(np.asarray(kx, np.float64)[::-1], W, 1),
                         image.dtype)
        Bh = jnp.asarray(band_matrix(np.asarray(ky, np.float64)[::-1], H, 1),
                         image.dtype)
        y = jnp.einsum("...hw,wv->...hv", image, Bw,
                       preferred_element_type=jnp.float32)
        y = jnp.einsum("hu,...hv->...uv", Bh, y.astype(image.dtype),
                       preferred_element_type=jnp.float32)
        return y.astype(image.dtype)
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
    """Isotropic Gaussian blur (reference: apply_gaussian_filter).

    ``sigma`` is a static Python float, so taps are built concretely in
    numpy — this keeps the TPU band-matmul path available under jit.
    """
    import numpy as np

    radius = max(1, int(math.ceil(truncate * float(sigma))))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * float(sigma) ** 2))
    k = k / k.sum()
    return separable_conv2d(image, k, k)


def box_blur(image: jnp.ndarray, radius: int) -> jnp.ndarray:
    import numpy as np

    n = 2 * radius + 1
    k = np.full((n,), 1.0 / n)
    return separable_conv2d(image, k, k)


def sobel(image: jnp.ndarray):
    """Sobel x/y derivatives (reference: LinearFiltering.hpp sobel kernels)."""
    d = jnp.array([-1.0, 0.0, 1.0], image.dtype)
    s = jnp.array([1.0, 2.0, 1.0], image.dtype) / 4.0
    gx = separable_conv2d(image, d, s)
    gy = separable_conv2d(image, s, d)
    return gx, gy
