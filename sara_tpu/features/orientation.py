"""Dominant gradient orientation assignment.

TPU-native rebuild of the reference's orientation histogram stage
(reference: cpp/src/DO/Sara/FeatureDescriptors/Orientation.hpp:149-260 —
36-bin Gaussian-weighted histogram over a radius 3*(1.5 sigma) patch, 6x
circular box-3 "Lowe" smoothing, peaks >= 0.8 * max with parabolic
refinement; cf. the GPU formulation in
Shakti/Halide/Generators/DominantGradientOrientationsGeneratorV2.cpp).

Vectorization strategy (v2, gather-free): a Gaussian-weighted histogram at a
point is exactly a Gaussian blur of the per-pixel binned magnitude maps
evaluated at that point. So per scale we build dense (36, H, W) binned
magnitude maps, blur them with sigma_w = 1.5 * sigma_s (the whole stack is
one separable convolution — MXU/VPU work), and each keypoint reads its
36-vector with four bilinear taps. This replaces ~2200 gathered pixels per
keypoint with 4 gathers of contiguous 36-channel rows — the original
formulation was gather-bound on TPU (~300 ms/frame; this one is ~ms).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from sara_tpu.image.filtering import separable_conv2d, gaussian_kernel_1d

NUM_BINS = 36


def _binned_magnitude(gx: jnp.ndarray, gy: jnp.ndarray) -> jnp.ndarray:
    """(H, W) gradients -> (36, H, W) hard-binned magnitude maps."""
    mag = jnp.sqrt(gx * gx + gy * gy)
    ori = jnp.arctan2(gy, gx)
    two_pi = 2.0 * jnp.pi
    frac = jnp.mod(ori, two_pi) / two_pi * NUM_BINS
    b = jnp.floor(frac).astype(jnp.int32) % NUM_BINS
    onehot = jax.nn.one_hot(b, NUM_BINS, dtype=mag.dtype, axis=0)  # (36,H,W)
    return onehot * mag[None]


from sara_tpu.image.filtering import band_matrix as _band_matrix  # noqa: E402


def _bilinear_channels(maps: jnp.ndarray, ys, xs):
    """Bilinear sample (C, H, W) maps at float positions -> (K, C)."""
    C, H, W = maps.shape
    x = jnp.clip(xs, 0.0, W - 1.0)
    y = jnp.clip(ys, 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    m = jnp.moveaxis(maps, 0, -1)  # (H, W, C): channel rows contiguous
    return (m[y0, x0] * (1 - fx) * (1 - fy) + m[y0, x1] * fx * (1 - fy)
            + m[y1, x0] * (1 - fx) * fy + m[y1, x1] * fx * fy)


def orientation_maps(gx_stack: jnp.ndarray, gy_stack: jnp.ndarray,
                     sigmas, radius_factor: float = 1.5,
                     compute_dtype=None, downsample: int = 1,
                     pad_channels: int = 0) -> jnp.ndarray:
    """Dense Gaussian-blurred 36-bin magnitude maps, (S, Hc, Wc, 36).

    ``pad_channels``: zero-pad the channel dim to this width (TPU lane
    tiling pads the minor dim to 128 physically anyway; padding it
    LOGICALLY at the producer lets the patch-DMA sampler slice whole
    tiles and XLA fold the pad into the transpose it already performs,
    instead of a separate ~1 ms pad copy per frame). Consumers index
    channels [:36] explicitly.

    The shared field both orientation assignment and the fast "field"
    descriptor sample from: blur sigma_w = radius_factor * sigma_s per
    scale equals BOTH the reference's orientation-histogram window
    (Orientation.hpp:149-196) and the descriptor's spatial-bin half-width
    l/2 = 1.5 sigma (SIFT.hpp bin_scale_unit=3), so one set of maps serves
    both stages.
    """
    import math

    import numpy as np

    S, H, W = gx_stack.shape
    dtype = (jnp.dtype(compute_dtype) if compute_dtype is not None
             else gx_stack.dtype)

    dense = jax.vmap(_binned_magnitude)(gx_stack, gy_stack)  # (S, 36, H, W)
    dense = dense.astype(dtype)

    stride = downsample
    Hc = -(-H // stride)
    Wc = -(-W // stride)
    sig_eff = [radius_factor * float(sg) for sg in sigmas[:S]]

    # (A 2x2-sum-pool-before-blur variant was measured: it cuts the blur
    # GEMM FLOPs 3x but the stage time did NOT move — the blur is not the
    # stage's bottleneck on this chip — while costing ~6% of the correct
    # matches. Exact strided blur kept.)
    radii = [max(1, int(math.ceil(3.0 * sw))) for sw in sig_eff]

    if jax.default_backend() == "tpu":
        # Blur = banded-Toeplitz matmul per axis per scale (MXU); a grouped
        # depthwise conv lowers to a slow per-group VPU path (NOTES.md).
        per_scale = []
        for si in range(S):
            sw = sig_eff[si]
            xs = np.arange(-radii[si], radii[si] + 1, dtype=np.float64)
            taps = np.exp(-(xs * xs) / (2.0 * sw * sw))
            Bw = jnp.asarray(_band_matrix(taps, W, stride), dtype)
            Bh = jnp.asarray(_band_matrix(taps, H, stride), dtype)
            r1 = jnp.einsum("bhw,wv->bhv", dense[si], Bw,
                            preferred_element_type=jnp.float32)
            r2 = jnp.einsum("bhv,hu->buv", r1.astype(dtype), Bh,
                            preferred_element_type=jnp.float32)
            per_scale.append(r2.astype(dtype))
        maps = jnp.stack(per_scale, axis=0)       # (S, 36, Hc, Wc)
    else:
        # XLA:CPU: per-scale separable grouped path (identical math).
        per_scale = []
        for si in range(S):
            sw = sig_eff[si]
            xs = np.arange(-radii[si], radii[si] + 1, dtype=np.float64)
            taps = jnp.asarray(np.exp(-(xs * xs) / (2.0 * sw * sw)), dtype)
            per_scale.append(separable_conv2d(dense[si], taps, taps))
        maps = jnp.stack(per_scale, axis=0)[:, :, ::stride, ::stride]
    out = jnp.moveaxis(maps, 1, -1)               # (S, Hc, Wc, 36)
    if pad_channels > NUM_BINS:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, 0),
                            (0, pad_channels - NUM_BINS)))
    return out


def sample_orientation_maps(maps: jnp.ndarray, x, y, s,
                            downsample: int = 1,
                            bilinear: bool = True) -> jnp.ndarray:
    """Read each keypoint's 36-vector from the dense maps.

    The scale index folds into one flat row gather (a vmapped
    dynamic_index over the scale axis materializes (K, H, W, 36) — 160 GB;
    the multi-axis advanced-indexing form kernel-faults this runtime at
    large K, NOTES.md). ``bilinear=False`` reads ONE nearest row per
    keypoint instead of four — row-gather throughput (~30 rows/us) bounds
    this stage on TPU, and the maps are already Gaussian-blurred with
    sigma_w >= 2.4 map pixels, so the <=0.5 px sampling shift is far
    inside the window (quality-gated in eval_detection_quality).
    """
    S, Hc, Wc, Cm = maps.shape          # Cm may be lane-padded (>= 36)
    s_idx = jnp.clip(jnp.round(s).astype(jnp.int32), 0, S - 1)
    if downsample > 1:
        # Half-res sample j holds the blur at original pixel stride*j.
        x = x / downsample
        y = y / downsample
    xc = jnp.clip(x, 0.0, Wc - 1.0)
    yc = jnp.clip(y, 0.0, Hc - 1.0)
    flat = maps.reshape(S * Hc * Wc, Cm)
    base = s_idx * (Hc * Wc)

    def take(yy, xx):
        return jnp.take(flat, base + yy * Wc + xx,
                        axis=0).astype(jnp.float32)[:, :NUM_BINS]

    if not bilinear:
        xn = jnp.round(xc).astype(jnp.int32)
        yn = jnp.round(yc).astype(jnp.int32)
        return take(yn, xn)

    x0 = jnp.floor(xc).astype(jnp.int32)
    y0 = jnp.floor(yc).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, Wc - 1)
    y1 = jnp.minimum(y0 + 1, Hc - 1)
    fx = (xc - x0)[:, None].astype(jnp.float32)
    fy = (yc - y0)[:, None].astype(jnp.float32)
    return (take(y0, x0) * (1 - fx) * (1 - fy)
            + take(y0, x1) * fx * (1 - fy)
            + take(y1, x0) * (1 - fx) * fy
            + take(y1, x1) * fx * fy)


def orientation_histograms(gx_stack: jnp.ndarray, gy_stack: jnp.ndarray,
                           x, y, s, sigmas, radius_factor: float = 1.5,
                           compute_dtype=None, downsample: int = 1):
    """36-bin Gaussian-weighted orientation histograms for K keypoints.

    Thin composition of :func:`orientation_maps` (dense blurred binned maps)
    and :func:`sample_orientation_maps` (per-keypoint bilinear reads); see
    those for the TPU design notes. Returns (K, 36) float32.
    """
    maps = orientation_maps(gx_stack, gy_stack, sigmas,
                            radius_factor=radius_factor,
                            compute_dtype=compute_dtype,
                            downsample=downsample)
    return sample_orientation_maps(maps, x, y, s, downsample=downsample)


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
    import jax

    left = jnp.roll(hist, 1, axis=-1)
    right = jnp.roll(hist, -1, axis=-1)
    gmax = jnp.max(hist, axis=-1, keepdims=True)
    is_peak = (hist > left) & (hist > right) & (hist >= peak_ratio * gmax) & (gmax > 0)

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


def dominant_orientations(gx_stack, gy_stack, x, y, s, sigmas,
                          max_peaks: int = 3, compute_dtype=None,
                          downsample: int = 1):
    """Full pipeline: dense histogram maps -> smooth -> peaks."""
    hist = orientation_histograms(gx_stack, gy_stack, x, y, s, sigmas,
                                  compute_dtype=compute_dtype,
                                  downsample=downsample)
    hist = lowe_smooth(hist)
    return find_orientation_peaks(hist, max_peaks)
