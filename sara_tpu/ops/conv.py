"""Pallas kernel: row-direction 1-D convolution (separable filter half).

TPU counterpart of the reference's separable convolution generators
(reference: cpp/src/DO/Shakti/Halide/Generators/SeparableConvolution2dGenerator.cpp,
GaussianConvolutionGenerator.cpp). The kernel keeps a (TILE_H, W) image
block resident in VMEM and accumulates the taps as shifted fused
multiply-adds on the VPU — one HBM round trip per block instead of one per
tap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rows_kernel(x_ref, k_ref, o_ref, *, radius: int):
    x = x_ref[:]                    # (TILE_H, W_padded)
    acc = jnp.zeros_like(x)
    # Static tap loop: shifted adds, fused on the VPU.
    for t in range(2 * radius + 1):
        acc = acc + k_ref[0, t] * jnp.roll(x, radius - t, axis=1)
    o_ref[:] = acc


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("radius",))
def separable_conv_rows_pallas(image: jnp.ndarray, taps: jnp.ndarray,
                               radius: int) -> jnp.ndarray:
    """Convolve rows with (2*radius+1) taps; replicate borders.

    image: (H, W) float32. taps: (2*radius+1,). Interior exact; the kernel
    computes on an edge-padded copy so borders replicate like the XLA path.
    """
    H, W = image.shape
    pad = radius
    xp = jnp.pad(image, ((0, 0), (pad, pad)), mode="edge")
    Wp = xp.shape[1]
    tile_h = min(H, 256)
    grid = (pl.cdiv(H, tile_h),)
    k2 = taps.reshape(1, -1).astype(image.dtype)

    out = pl.pallas_call(
        functools.partial(_rows_kernel, radius=radius),
        out_shape=jax.ShapeDtypeStruct((H, Wp), image.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_h, Wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * radius + 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_h, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=not _on_tpu(),
    )(xp, k2)
    return out[:, pad: pad + W]
