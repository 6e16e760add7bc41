"""Pallas TPU kernel: bulk patch-DMA field sampling.

The descriptor/orientation stages read K x N bilinear samples of contiguous
C-channel rows from a dense (S, H, W, C) field. XLA lowers those reads to
per-row HBM gathers, and this runtime's measured random row-gather rate
(~30 rows/us, NOTES.md round-3) bounds the whole frontend: the descriptor
stage alone is ~4-17 ms/frame while its arithmetic is microseconds.

The TPU-native fix (reference analog: the Halide GPU SIFT pipeline,
cpp/src/DO/Shakti/Halide/SIFT/V2/Pipeline.hpp:46-178, which tiles the
gradient maps into GPU shared memory): all N samples of one keypoint live
inside a fixed-size (PH, PW) window of ONE scale slice, so instead of N
random row reads we issue ONE strided DMA per keypoint — HBM -> VMEM bulk
transfer at bandwidth rather than gather-descriptor rate — and evaluate the
bilinear weighting as a tiny MXU contraction against the VMEM-resident
patch:

    out[n, c] = sum_{a,b} triangle(ry_n - a) * triangle(rx_n - b)
                * patch[a, b, c]

The per-step pipeline double-buffers patches (grid steps are sequential on
TPU, so scratch persists): while block i computes, block i+1's BK patch
DMAs are in flight. Per-keypoint traffic is PH*PW*C*2 bytes (~74 KB at
32x32x36 bf16) against ~1 KB of useful rows — a 36x inflation that is still
>=10x faster than gathers because HBM bandwidth (~800 GB/s) dwarfs the
~4 GB/s effective gather rate.

Exactness: the kernel computes true bilinear samples (the shipped XLA path
uses nearest sampling for descriptors to cut gather count — the kernel gets
the higher-quality bilinear reads for free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sampler_kernel(idx_ref, rely_ref, relx_ref, maps_ref, out_ref,
                    patch_scr, sems, *, BK: int, PH: int, PW: int,
                    N: int, nsteps: int, packed_c: int = 0):
    """Grid step i: wait for block i's patches, weight-contract them, and
    keep block i+1's DMAs in flight (double buffer).

    ``packed_c`` > 0: x-PACKED mode — the W axis carries x-PAIRS and the
    channel axis holds [even-x 0:packed_c | odd-x packed_c:2*packed_c]
    (a free row-major view of the raw maps). Halves the lane-padding waste
    of the patch DMA (72/128 useful vs 36/128); the bilinear x-weights
    split into even/odd matrices and the two MXU products recombine the
    channel halves.
    """
    i = pl.program_id(0)

    def dma(step, slot, j):
        k = step * BK + j
        si = idx_ref[3 * k]                    # flat: SMEM 2-D arrays pad
        y0 = idx_ref[3 * k + 1]                # the minor dim to 128 lanes
        x0 = pl.multiple_of(idx_ref[3 * k + 2], 8)  # host aligns x0 to 8
        return pltpu.make_async_copy(
            maps_ref.at[si, pl.ds(y0, PH), pl.ds(x0, PW), :],
            patch_scr.at[slot, j],
            sems.at[slot, j])

    @pl.when(i == 0)
    def _():
        for j in range(BK):
            dma(0, 0, j).start()

    @pl.when(i + 1 < nsteps)
    def _():
        for j in range(BK):
            dma(i + 1, (i + 1) % 2, j).start()

    slot = i % 2
    ay = jax.lax.broadcasted_iota(jnp.int32, (PH, N), 0).astype(jnp.float32)
    ax = jax.lax.broadcasted_iota(jnp.int32, (PW, N), 0).astype(jnp.float32)

    def contract(w2, patch2):
        return jax.lax.dot_general(
            w2, patch2.astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    for j in range(BK):
        dma(i, slot, j).wait()
        ry = rely_ref[pl.ds(j, 1), :]                      # (1, N)
        rx = relx_ref[pl.ds(j, 1), :]
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(ay - ry))      # (PH, N)
        patch = patch_scr[slot, j].reshape(PH * PW, -1)
        if packed_c:
            # rx is in REAL pixels relative to cell origin; cell c holds
            # real columns 2c (channels [:C]) and 2c+1 (channels [C:2C]).
            wx_e = jnp.maximum(0.0, 1.0 - jnp.abs(2.0 * ax - rx))
            wx_o = jnp.maximum(0.0, 1.0 - jnp.abs(2.0 * ax + 1.0 - rx))
            w2e = (wy[:, None, :] * wx_e[None, :, :]).reshape(PH * PW, N)
            w2o = (wy[:, None, :] * wx_o[None, :, :]).reshape(PH * PW, N)
            Me = contract(w2e, patch)
            Mo = contract(w2o, patch)
            out_ref[j] = (Me[:, :packed_c]
                          + Mo[:, packed_c:2 * packed_c])  # (N, C)
        else:
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(ax - rx))  # (PW, N)
            w2 = (wy[:, None, :] * wx[None, :, :]).reshape(PH * PW, N)
            out_ref[j] = contract(w2, patch)               # (N, C)


@functools.partial(jax.jit, static_argnames=("PH", "PW", "BK", "interpret"))
def _sample_patches(maps, s_idx, ys, xs, PH: int, PW: int, BK: int,
                    interpret: bool):
    S, H, W, C = maps.shape
    K, N = ys.shape

    # DMA slices must cover whole 128-lane tiles; the (.., C) minor dim is
    # physically lane-padded to 128 in HBM regardless, so pad it logically
    # too (the copy is bandwidth-cheap next to the gathers it replaces).
    Cp = -(-C // 128) * 128
    if Cp != C:
        maps = jnp.pad(maps, ((0, 0), (0, 0), (0, 0), (0, Cp - C)))

    # Patch origin centered on the sample centroid, clamped to the map.
    # The x-origin must be 8-aligned (Mosaic tiles the (W, C) minor dims
    # (8, 128); a DMA slice start in W must respect the sublane tiling), so
    # PW carries +8 slack and x0 rounds down to the tile boundary.
    cy = 0.5 * (jnp.min(ys, axis=1) + jnp.max(ys, axis=1))
    cx = 0.5 * (jnp.min(xs, axis=1) + jnp.max(xs, axis=1))
    y0 = jnp.clip(jnp.round(cy).astype(jnp.int32) - PH // 2, 0, H - PH)
    x0 = jnp.clip(jnp.round(cx).astype(jnp.int32) - (PW - 8) // 2,
                  0, W - (PW - 8))
    x0 = jnp.clip((x0 // 8) * 8, 0, W - PW)

    # Relative sample coordinates within the patch, matching the XLA path's
    # clamp-to-map semantics (origin clamping keeps every clamped sample
    # inside the patch as long as the spread fits — checked by the caller).
    rely = jnp.clip(ys, 0.0, H - 1.0) - y0[:, None].astype(jnp.float32)
    relx = jnp.clip(xs, 0.0, W - 1.0) - x0[:, None].astype(jnp.float32)
    rely = jnp.clip(rely, 0.0, PH - 1.0)
    relx = jnp.clip(relx, 0.0, PW - 1.0)

    Kp = -(-K // BK) * BK
    pad = Kp - K
    idx = jnp.stack([jnp.clip(s_idx, 0, S - 1), y0, x0], axis=1)
    if pad:
        idx = jnp.concatenate(
            [idx, jnp.zeros((pad, 3), jnp.int32)], axis=0)
        rely = jnp.concatenate(
            [rely, jnp.zeros((pad, N), rely.dtype)], axis=0)
        relx = jnp.concatenate(
            [relx, jnp.zeros((pad, N), relx.dtype)], axis=0)
    idx = idx.reshape(-1)
    nsteps = Kp // BK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((BK, N), lambda i, idx: (i, 0)),
            pl.BlockSpec((BK, N), lambda i, idx: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((BK, N, Cp), lambda i, idx: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, BK, PH, PW, Cp), maps.dtype),
            pltpu.SemaphoreType.DMA((2, BK)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_sampler_kernel, BK=BK, PH=PH, PW=PW, N=N,
                          nsteps=nsteps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Kp, N, Cp), jnp.float32),
        interpret=interpret,
    )(idx, rely.astype(jnp.float32), relx.astype(jnp.float32), maps)
    return out[:K, :, :C]


@functools.partial(jax.jit, static_argnames=("PH", "PWc", "BK",
                                               "interpret"))
def _sample_patches_packed(maps, s_idx, ys, xs, PH: int, PWc: int, BK: int,
                           interpret: bool):
    """x-packed variant: maps (S, H, W, C) viewed as (S, H, W/2, 2C) cells
    (FREE row-major reinterpretation), padded to 128 lanes — 72/128 useful
    vs 36/128 for the plain layout, halving the patch-DMA traffic."""
    S, H, W, C = maps.shape
    K, N = ys.shape
    Wp = W // 2
    mp = maps.reshape(S, H, Wp, 2 * C)
    Cp = -(-2 * C // 128) * 128
    if Cp != 2 * C:
        mp = jnp.pad(mp, ((0, 0), (0, 0), (0, 0), (0, Cp - 2 * C)))

    cy = 0.5 * (jnp.min(ys, axis=1) + jnp.max(ys, axis=1))
    cx = 0.5 * (jnp.min(xs, axis=1) + jnp.max(xs, axis=1))
    y0 = jnp.clip(jnp.round(cy).astype(jnp.int32) - PH // 2, 0, H - PH)
    side = 2 * (PWc - 8)
    o_real = jnp.clip(jnp.round(cx).astype(jnp.int32) - side // 2,
                      0, W - side)
    c0 = jnp.clip(((o_real // 2) // 8) * 8, 0, Wp - PWc)

    rely = jnp.clip(ys, 0.0, H - 1.0) - y0[:, None].astype(jnp.float32)
    relx = jnp.clip(xs, 0.0, W - 1.0) \
        - (2 * c0)[:, None].astype(jnp.float32)
    rely = jnp.clip(rely, 0.0, PH - 1.0)
    relx = jnp.clip(relx, 0.0, 2.0 * PWc - 1.0)

    Kp = -(-K // BK) * BK
    pad = Kp - K
    idx = jnp.stack([jnp.clip(s_idx, 0, S - 1), y0, c0], axis=1)
    if pad:
        idx = jnp.concatenate(
            [idx, jnp.zeros((pad, 3), jnp.int32)], axis=0)
        rely = jnp.concatenate(
            [rely, jnp.zeros((pad, N), rely.dtype)], axis=0)
        relx = jnp.concatenate(
            [relx, jnp.zeros((pad, N), relx.dtype)], axis=0)
    idx = idx.reshape(-1)
    nsteps = Kp // BK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((BK, N), lambda i, idx: (i, 0)),
            pl.BlockSpec((BK, N), lambda i, idx: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((BK, N, C), lambda i, idx: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, BK, PH, PWc, Cp), mp.dtype),
            pltpu.SemaphoreType.DMA((2, BK)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_sampler_kernel, BK=BK, PH=PH, PW=PWc, N=N,
                          nsteps=nsteps, packed_c=C),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Kp, N, C), jnp.float32),
        interpret=interpret,
    )(idx, rely.astype(jnp.float32), relx.astype(jnp.float32), mp)
    return out[:K]


# Budget for the double-buffered patch scratch. TPU VMEM is ~16 MB/core and
# must also hold the (BK, N) weight blocks, the (BK, N, Cp) output block and
# Mosaic's own working set — cap the scratch well below the physical size so
# oversized geometries fall back to XLA gathers instead of failing at Mosaic
# compile time (advisor finding, round 4).
_VMEM_SCRATCH_BUDGET = 8 * 1024 * 1024


def _fit_block(block: int, per_patch_bytes: int) -> int:
    """Largest BK <= block whose double-buffered scratch fits the budget
    (0 if even BK=1 does not fit)."""
    bk = min(block, max(0, _VMEM_SCRATCH_BUDGET // (2 * per_patch_bytes)))
    return int(bk)


def patch_extent(max_sample_radius: float) -> int:
    """Smallest supported square patch side covering samples within
    ``max_sample_radius`` map pixels of the patch center (+1 px bilinear
    support, +1 px origin rounding)."""
    need = 2 * (int(max_sample_radius + 2.0)) + 2
    for side in (8, 16, 24, 32, 40, 48, 64):
        if side >= need:
            return side
    return -1


def sample_field_patches(maps: jnp.ndarray, s_idx: jnp.ndarray,
                         ys: jnp.ndarray, xs: jnp.ndarray,
                         max_sample_radius: float,
                         block: int = 8,
                         pack_x: bool = False,
                         interpret: bool = False) -> jnp.ndarray | None:
    """Bilinear-sample (K, N) positions from (S, H, W, C) maps via bulk
    patch DMA. Returns (K, N, C) float32, or None if the geometry does not
    fit a supported patch size (caller falls back to XLA gathers).

    Args:
      maps: (S, H, W, C) field (bf16 or f32).
      s_idx: (K,) int32 scale-slice index per keypoint.
      ys, xs: (K, N) float sample positions in map pixels; all N samples of
        keypoint k must lie within ``max_sample_radius`` of their centroid.
      max_sample_radius: static bound on that spread (map pixels).
      interpret: run the Pallas interpreter (CPU testing).
    """
    S, H, W, C = maps.shape
    side = patch_extent(max_sample_radius)
    if side < 0:
        return None
    # x-packed layout: needs an even, 16-multiple width (cell origin is
    # 8-cell aligned) and 2C <= 128 lanes.
    # NOTE pack_x default False: the (S,H,W,C)->(S,H,W/2,2C) view is free
    # in row-major logic but NOT in XLA's tiled (W, C)-lane layout — the
    # relayout lowered to a ~340 ms/frame gather-class fusion (traced).
    # The packed kernel stays available for a caller that produces packed
    # maps natively.
    itemsize = jnp.dtype(maps.dtype).itemsize
    if pack_x and 2 * C <= 128 and W % 16 == 0:
        PWc = -(-(side // 2 + 8) // 8) * 8   # 8-aligned cell width
        bk = _fit_block(block, side * PWc * 128 * itemsize)
        if H >= side and W // 2 >= PWc and bk > 0:
            return _sample_patches_packed(
                maps, s_idx.astype(jnp.int32), ys, xs,
                PH=side, PWc=PWc, BK=bk, interpret=interpret)
    # W % 8 == 0 keeps the aligned x-origin clip exact (all the octave map
    # widths of pow2-friendly inputs satisfy it; others fall back).
    if H < side or W < side + 8 or W % 8 != 0:
        return None
    Cp = -(-C // 128) * 128
    bk = _fit_block(block, side * (side + 8) * Cp * itemsize)
    if bk == 0:
        return None
    return _sample_patches(maps, s_idx.astype(jnp.int32), ys, xs,
                           PH=side, PW=side + 8, BK=bk,
                           interpret=interpret)
