"""GEMM-based convolution via im2col patch extraction.

TPU-native rebuild of the reference's GEMM convolution path
(reference: cpp/src/DO/Sara/ImageProcessing/GemmBasedConvolution.hpp,
Shakti/Halide/Generators/Im2ColGenerator.cpp). On TPU the MXU *is* the
convolution unit, so this is mostly useful for exotic kernel shapes and as
the patch extractor feeding custom GEMM pipelines.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def im2col(image: jnp.ndarray, kh: int, kw: int, stride: int = 1):
    """(H, W) -> (Ho*Wo, kh*kw) patch matrix (VALID padding)."""
    H, W = image.shape
    Ho = (H - kh) // stride + 1
    Wo = (W - kw) // stride + 1
    idx_y = (jnp.arange(Ho) * stride)[:, None, None, None]
    idx_x = (jnp.arange(Wo) * stride)[None, :, None, None]
    off_y = jnp.arange(kh)[None, None, :, None]
    off_x = jnp.arange(kw)[None, None, None, :]
    patches = image[idx_y + off_y, idx_x + off_x]  # (Ho, Wo, kh, kw)
    return patches.reshape(Ho * Wo, kh * kw), (Ho, Wo)


@functools.partial(jax.jit, static_argnames=("stride",))
def gemm_conv2d(image: jnp.ndarray, kernel: jnp.ndarray, stride: int = 1):
    """2-D VALID convolution as im2col + one MXU GEMM (correlation
    convention, matching lax.conv with flipped kernel)."""
    kh, kw = kernel.shape
    cols, (Ho, Wo) = im2col(image, kh, kw, stride)
    out = cols @ kernel.reshape(-1)
    return out.reshape(Ho, Wo)
