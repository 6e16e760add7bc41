"""Pallas kernel: tiled pairwise squared-distance (descriptor matching).

TPU counterpart of the reference's GPU matching path (the Shakti design
implies exact GEMM matching; reference: cpp/src/DO/Shakti/Halide/
Generators/Im2ColGenerator.cpp + BatchedConvolutionGenerator.cpp use the
same blocked-GEMM structure). Each (TILE_A, TILE_B) distance tile is
computed on the MXU from VMEM-resident descriptor blocks:

    d2 = |a|^2 + |b|^2 - 2 a.b

This kernel is the building block for matching at map scale (fused running
top-2 lands in a later revision; XLA's top_k consumes the tiles for now).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dist_kernel(a_ref, b_ref, o_ref):
    a = a_ref[:]                       # (TILE_A, D)
    b = b_ref[:]                       # (TILE_B, D)
    cross = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    na = jnp.sum(a * a, axis=1, keepdims=True)
    nb = jnp.sum(b * b, axis=1, keepdims=True)
    o_ref[:] = jnp.maximum(na + nb.T - 2.0 * cross, 0.0)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("tile_a", "tile_b"))
def pairwise_sqdist_pallas(da: jnp.ndarray, db: jnp.ndarray,
                           tile_a: int = 512, tile_b: int = 512) -> jnp.ndarray:
    """(Na, D) x (Nb, D) -> (Na, Nb) squared L2 distances, tiled on the MXU.

    Na/Nb should be multiples of the tile sizes (the fixed-capacity
    keypoint buffers are sized accordingly); remainders fall back to the
    XLA path.
    """
    Na, D = da.shape
    Nb, _ = db.shape
    if Na % tile_a or Nb % tile_b:
        na = jnp.sum(da * da, axis=1, keepdims=True)
        nb = jnp.sum(db * db, axis=1, keepdims=True)
        return jnp.maximum(na + nb.T - 2.0 * da @ db.T, 0.0)

    grid = (Na // tile_a, Nb // tile_b)
    return pl.pallas_call(
        _dist_kernel,
        out_shape=jax.ShapeDtypeStruct((Na, Nb), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_a, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_a, tile_b), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=not _on_tpu(),
    )(da.astype(jnp.float32), db.astype(jnp.float32))
