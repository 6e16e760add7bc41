"""SIFT descriptor (4x4 spatial bins x 8 orientation bins = 128-D).

TPU-native rebuild of the reference descriptor
(reference: cpp/src/DO/Sara/FeatureDescriptors/SIFT.hpp:44-263; algorithm
constants per SURVEY.md A.1: bin scale unit l = 3 sigma, Gaussian window
sigma_w = N/2 bin units, trilinear accumulation with orientation wraparound,
L2 normalize -> clamp 0.2 -> renormalize).

Vectorization strategy (the key TPU redesign): instead of iterating over all
image pixels in the support disk (radius sqrt(2)*l*(N+1)/2, data-dependent),
each keypoint samples a FIXED T x T grid (T = 4N) in its canonical frame via
bilinear interpolation of the *gradient component* maps (gx, gy packed as
2 channels -> one contiguous gather per bilinear corner; interpolating
components instead of (mag, angle) is also correct across the +-pi angle
wrap). Spatial trilinear weights depend only on the (static) grid position,
so descriptor accumulation factorizes into per-axis weight matrices and an
einsum that XLA maps onto the MXU — no scatters, no dynamic shapes. Same
accumulation algebra as the reference's GPU descriptor generators
(Shakti/Halide/Generators/SIFTGeneratorV5.cpp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

N_SPATIAL = 4     # spatial bins per axis
N_ORI = 8         # orientation bins
T = 4 * N_SPATIAL  # sample grid size (16)
BIN_SCALE_UNIT = 3.0
MAX_BIN_VALUE = 0.2


def _spatial_weights(dtype=jnp.float32) -> jnp.ndarray:
    """(T, N_SPATIAL) linear interpolation weights of each sample row/col
    into the spatial bins. Sample i sits at bin coordinate u = (i+0.5)/4 - 0.5
    in [-0.5, 3.5]; weight to bin r is max(0, 1 - |u - r|)."""
    i = jnp.arange(T, dtype=dtype)
    u = (i + 0.5) / (T / N_SPATIAL) - 0.5  # (T,)
    r = jnp.arange(N_SPATIAL, dtype=dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(u[:, None] - r[None, :]))


def _gaussian_window(dtype=jnp.float32) -> jnp.ndarray:
    """(T, T) Gaussian weight, sigma_w = N/2 bin units (reference:
    SIFT.hpp:112-113)."""
    i = jnp.arange(T, dtype=dtype)
    u = (i + 0.5) / (T / N_SPATIAL) - N_SPATIAL / 2.0  # centered bin coords
    g = jnp.exp(-(u ** 2) / (2.0 * (N_SPATIAL / 2.0) ** 2))
    return g[:, None] * g[None, :]


def sift_descriptors(gx_stack: jnp.ndarray, gy_stack: jnp.ndarray,
                     x, y, s, theta, sigmas,
                     bilinear: bool = True, compute_dtype=None) -> jnp.ndarray:
    """Compute 128-D SIFT descriptors for K keypoints in one octave.

    Args:
      gx_stack, gy_stack: (S, H, W) gradient component stacks of the octave
        Gaussians.
      x, y: (K,) positions (octave pixel coords).
      s: (K,) continuous scale index.
      theta: (K,) keypoint orientation (radians).
      sigmas: per-scale sigmas (tuple of floats).
      compute_dtype: storage dtype of the gathered gradient maps (bfloat16
        halves the gather traffic — the stage's dominant cost on TPU;
        magnitudes/angles and the binning einsum stay float32).

    Returns:
      descriptors: (K, 128) float32, L2-normalized with 0.2 clamping.
    """
    S, H, W = gx_stack.shape
    if compute_dtype is not None:
        gx_stack = gx_stack.astype(compute_dtype)
        gy_stack = gy_stack.astype(compute_dtype)
    s_idx = jnp.clip(jnp.round(s).astype(jnp.int32), 0, S - 1)
    sig_table = jnp.asarray(sigmas, jnp.float32)
    sigma = sig_table[s_idx]
    l = BIN_SCALE_UNIT * sigma  # bin side length in pixels (K,)

    # Sample positions in the canonical keypoint frame.
    i = jnp.arange(T, dtype=jnp.float32)
    u = (i + 0.5) / (T / N_SPATIAL) - N_SPATIAL / 2.0  # (T,)
    uu, vv = jnp.meshgrid(u, u)  # uu = column (x'), vv = row (y')
    ct, st = jnp.cos(theta), jnp.sin(theta)
    dx = (ct[:, None, None] * uu - st[:, None, None] * vv) * l[:, None, None]
    dy = (st[:, None, None] * uu + ct[:, None, None] * vv) * l[:, None, None]
    xs = x[:, None, None] + dx  # (K, T, T)
    ys = y[:, None, None] + dy

    # Pack (gx, gy) as trailing channels: one gather per bilinear corner,
    # with the per-keypoint scale index folded directly into the gather
    # (no vmapped dynamic_index — that can materialize (K, H, W, 2)).
    maps = jnp.stack([gx_stack, gy_stack], axis=-1)  # (S, H, W, 2)
    si3 = s_idx[:, None, None]
    inside = (xs >= 0) & (xs <= W - 1) & (ys >= 0) & (ys <= H - 1)
    xc = jnp.clip(xs, 0.0, W - 1.0)
    yc = jnp.clip(ys, 0.0, H - 1.0)
    if bilinear:
        x0 = jnp.floor(xc).astype(jnp.int32)
        y0 = jnp.floor(yc).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, W - 1)
        y1 = jnp.minimum(y0 + 1, H - 1)
        fx = (xc - x0)[..., None]
        fy = (yc - y0)[..., None]
        g = (maps[si3, y0, x0].astype(jnp.float32) * (1 - fx) * (1 - fy)
             + maps[si3, y0, x1].astype(jnp.float32) * fx * (1 - fy)
             + maps[si3, y1, x0].astype(jnp.float32) * (1 - fx) * fy
             + maps[si3, y1, x1].astype(jnp.float32) * fx * fy)  # (K, T, T, 2)
    else:
        # Nearest sampling: 4x fewer gathers; the 16x16 grid oversamples the
        # 4x4 spatial bins enough that descriptor quality barely changes.
        xn = jnp.round(xc).astype(jnp.int32)
        yn = jnp.round(yc).astype(jnp.int32)
        g = maps[si3, yn, xn].astype(jnp.float32)  # (K, T, T, 2)
    gxs = g[..., 0]
    gys = g[..., 1]
    m = jnp.sqrt(gxs * gxs + gys * gys)
    o = jnp.arctan2(gys, gxs)

    # Rotate gradient orientations into the keypoint frame, bin over [0, 2pi).
    rel = jnp.mod(o - theta[:, None, None], 2.0 * jnp.pi)
    ob = rel / (2.0 * jnp.pi) * N_ORI  # (K, T, T) in [0, 8)
    o0 = jnp.floor(ob).astype(jnp.int32) % N_ORI
    o1 = (o0 + 1) % N_ORI
    fo = ob - jnp.floor(ob)

    w = m * _gaussian_window() * inside.astype(m.dtype)  # (K, T, T)

    # Orientation pair weights -> (K, T, T, 8); tiny static dim, XLA fuses.
    eye = jnp.eye(N_ORI, dtype=w.dtype)
    ori_w = eye[o0] * (1.0 - fo[..., None]) + eye[o1] * fo[..., None]

    Wrow = _spatial_weights()  # (T, 4)
    # descriptor[r, c, b] = sum_{ij} Wrow[i,r] Wrow[j,c] w[i,j] ori_w[i,j,b]
    desc = jnp.einsum("ir,jc,kij,kijb->krcb", Wrow, Wrow, w, ori_w)
    desc = desc.reshape(desc.shape[0], N_SPATIAL * N_SPATIAL * N_ORI)

    # Normalize -> clamp 0.2 -> renormalize (reference: SIFT.hpp:241-252).
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-12)
    desc = jnp.minimum(desc, MAX_BIN_VALUE)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-12)
    return desc


def root_sift(desc: jnp.ndarray) -> jnp.ndarray:
    """RootSIFT transform: L1-normalize then sqrt
    (reference: FeatureDescriptors/RootSIFT.hpp)."""
    l1 = jnp.sum(jnp.abs(desc), axis=-1, keepdims=True)
    return jnp.sqrt(desc / jnp.maximum(l1, 1e-12))


def sift_descriptors_field(maps: jnp.ndarray, x, y, s, theta, sigmas,
                           downsample: int = 1,
                           bilinear: bool = True,
                           sampler: str = "auto") -> jnp.ndarray:
    """128-D descriptors sampled from the dense blurred orientation maps.

    DAISY-style fast variant of the SIFT descriptor (cf. the exact-grid
    :func:`sift_descriptors`): each of the 4x4 spatial bins reads ONE
    bilinear sample of the shared 36-channel orientation field at the
    rotated bin center, and the 36 fine orientation channels collapse into
    the 8 coarse bins (rotated by theta) with circular triangle weights.

    The key identity making the maps shareable: their per-scale blur
    sigma_w = 1.5 sigma equals the descriptor's bin half-width l/2
    (l = 3 sigma, reference SIFT.hpp bin_scale_unit), so the Gaussian field
    aggregation plays the role of the reference's per-pixel tent window.

    Cost: 16 bin centers x 4 bilinear corners = 64 gathers of contiguous
    36-channel rows per keypoint, vs 256 scattered 2-channel gathers for
    the exact grid — the gather count, not bytes, bounds TPU runtime.

    Args:
      maps: (S, Hc, Wc, 36) from orientation_maps().
      x, y, s, theta: (K,) keypoint geometry (octave pixel coords).
      sigmas: per-scale sigmas (static tuple).
      downsample: the maps' stride (must match orientation_maps).
      sampler: "gather" = XLA row gathers (nearest or bilinear per
        ``bilinear``); "pallas" = bulk patch-DMA kernel
        (ops/patch_sampler.py — one strided HBM->VMEM DMA per keypoint +
        MXU bilinear weighting; beats the ~30 rows/us gather-rate floor
        and always samples exact bilinear); "auto" = pallas on TPU when
        the patch geometry fits, gather otherwise.

    Returns (K, 128) float32, L2-normalized with 0.2 clamping.
    """
    from sara_tpu.features.orientation import NUM_BINS as FB  # 36

    S, Hc, Wc, Cm = maps.shape          # Cm may be lane-padded (>= 36)
    K = x.shape[0]
    s_idx = jnp.clip(jnp.round(s).astype(jnp.int32), 0, S - 1)
    sig_table = jnp.asarray(sigmas, jnp.float32)
    l = BIN_SCALE_UNIT * sig_table[s_idx]                 # (K,)

    # Rotated 4x4 bin-center grid in image coords.
    u = (jnp.arange(N_SPATIAL, dtype=jnp.float32) - (N_SPATIAL - 1) / 2.0)
    uu, vv = jnp.meshgrid(u, u)                            # (4, 4) cols, rows
    ct, st = jnp.cos(theta), jnp.sin(theta)
    dx = (ct[:, None, None] * uu - st[:, None, None] * vv) * l[:, None, None]
    dy = (st[:, None, None] * uu + ct[:, None, None] * vv) * l[:, None, None]
    xs = (x[:, None, None] + dx).reshape(K, -1)            # (K, 16)
    ys = (y[:, None, None] + dy).reshape(K, -1)

    if downsample > 1:
        xs = xs / downsample
        ys = ys / downsample

    if sampler == "auto":
        import jax

        sampler = "pallas" if jax.default_backend() == "tpu" else "gather"
    F = None
    if sampler == "pallas":
        import math

        from sara_tpu.ops.patch_sampler import sample_field_patches

        # Static spread bound: bin centers at radius 1.5*sqrt(2)*l of the
        # keypoint (= the sample centroid for the symmetric 4x4 grid).
        rad = 1.5 * math.sqrt(2.0) * BIN_SCALE_UNIT * max(sigmas) \
            / downsample
        F = sample_field_patches(maps, s_idx, ys, xs,
                                 max_sample_radius=rad)  # None if unfit
        if F is not None:
            F = F[..., :FB]
    if F is None:
        xc = jnp.clip(xs, 0.0, Wc - 1.0)
        yc = jnp.clip(ys, 0.0, Hc - 1.0)
        # Flat single-axis row gather: the multi-axis advanced-indexing
        # form maps[si, y, x] reproducibly kernel-faults the TPU runtime
        # at K >= ~3840 (round-3 bisect, scripts/probe_fault_desc.py); a
        # linear row index into the (S*Hc*Wc, 36) view lowers to the
        # canonical 1-D gather and is also the layout-friendliest form.
        flat = maps.reshape(S * Hc * Wc, Cm)
        base = s_idx[:, None] * (Hc * Wc)

        def take(yy, xx):
            lin = (base + yy * Wc + xx).reshape(-1)
            return jnp.take(flat, lin, axis=0).reshape(K, -1, Cm) \
                .astype(jnp.float32)[..., :FB]

        if bilinear:
            x0 = jnp.floor(xc).astype(jnp.int32)
            y0 = jnp.floor(yc).astype(jnp.int32)
            x1 = jnp.minimum(x0 + 1, Wc - 1)
            y1 = jnp.minimum(y0 + 1, Hc - 1)
            fx = (xc - x0)[..., None].astype(jnp.float32)
            fy = (yc - y0)[..., None].astype(jnp.float32)
            F = (take(y0, x0) * (1 - fx) * (1 - fy)
                 + take(y0, x1) * fx * (1 - fy)
                 + take(y1, x0) * (1 - fx) * fy
                 + take(y1, x1) * fx * fy)                    # (K, 16, 36)
        else:
            # One nearest row per bin center: row-gather rate bounds this
            # stage on TPU (~30 rows/us) and the field is blurred with
            # sigma_w = l/2 >= 2.4 map px, so the <=0.5 px shift is benign
            # (quality-gated in eval_detection_quality).
            xn = jnp.round(xc).astype(jnp.int32)
            yn = jnp.round(yc).astype(jnp.int32)
            F = take(yn, xn)

    # Collapse 36 fine orientation channels into 8 theta-rotated coarse bins
    # with the exact path's circular triangle weights (bins centered at
    # rel = o * 45 deg).
    alpha = (jnp.arange(FB, dtype=jnp.float32) + 0.5) * (2 * jnp.pi / FB)
    ob = (alpha[None, :] - theta[:, None]) / (2 * jnp.pi) * N_ORI  # (K, 36)
    o = jnp.arange(N_ORI, dtype=jnp.float32)
    d = jnp.abs((ob[..., None] - o[None, None, :] + N_ORI / 2) % N_ORI
                - N_ORI / 2)
    wfo = jnp.maximum(0.0, 1.0 - d)                        # (K, 36, 8)

    # Global Gaussian window over the patch, sigma = N/2 bin units.
    g = jnp.exp(-(uu ** 2 + vv ** 2) / (2.0 * (N_SPATIAL / 2.0) ** 2))
    desc = jnp.einsum("knf,kfo->kno", F, wfo) * g.reshape(1, -1, 1)
    desc = desc.reshape(K, N_SPATIAL * N_SPATIAL * N_ORI)

    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-12)
    desc = jnp.minimum(desc, MAX_BIN_VALUE)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    return desc / jnp.maximum(norm, 1e-12)
