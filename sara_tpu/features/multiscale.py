"""Alternative scale-space detectors: LoG, Harris-Laplace, DoH (Hessian).

TPU-native rebuild of the reference detector family
(reference: cpp/src/DO/Sara/FeatureDetectors/LoG.hpp:34 ComputeLoGExtrema,
Harris.hpp:53-97 ComputeHarrisLaplaceCorners + scale_adapted_harris_cornerness,
Hessian.hpp:60-171 ComputeDoHExtrema / ComputeHessianLaplaceMaxima).

All reuse the vectorized 26-neighbor extremum + refinement machinery of
``sara_tpu.features.dog`` over per-octave response stacks computed from the
Gaussian pyramid.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from sara_tpu.core.types import Keypoints
from sara_tpu.features.dog import DoGParams, detect_dog_octave
from sara_tpu.image.differential import gradient, hessian
from sara_tpu.image.filtering import gaussian_blur
from sara_tpu.image.pyramid import GaussianPyramid, PyramidParams, gaussian_pyramid


def log_stack(gauss: jnp.ndarray, sigmas) -> jnp.ndarray:
    """Scale-normalized Laplacian responses per octave scale."""
    from sara_tpu.image.differential import laplacian

    sig = jnp.asarray(sigmas, gauss.dtype)[: gauss.shape[0], None, None]
    return laplacian(gauss) * sig * sig


def doh_stack(gauss: jnp.ndarray, sigmas) -> jnp.ndarray:
    """Scale-normalized determinant-of-Hessian responses."""
    dxx, dxy, dyy = hessian(gauss)
    sig = jnp.asarray(sigmas, gauss.dtype)[: gauss.shape[0], None, None]
    return (dxx * dyy - dxy * dxy) * sig ** 4


def harris_stack(gauss: jnp.ndarray, sigmas, kappa: float = 0.04,
                 sigma_i_factor: float = 3.0) -> jnp.ndarray:
    """Scale-adapted Harris cornerness per scale
    (reference: Harris.hpp:97 scale_adapted_harris_cornerness with
    sigma_I = 3 sigma_D... pipeline uses per-scale derivative scale)."""
    levels = []
    for s in range(gauss.shape[0]):
        sd = float(sigmas[s]) if s < len(sigmas) else float(sigmas[-1])
        gx, gy = gradient(gauss[s])
        si = sigma_i_factor * sd
        mxx = gaussian_blur(gx * gx, si)
        mxy = gaussian_blur(gx * gy, si)
        myy = gaussian_blur(gy * gy, si)
        det = mxx * myy - mxy * mxy
        tr = mxx + myy
        levels.append((sd * sd) ** 2 * (det - kappa * tr * tr))
    return jnp.stack(levels, axis=0)


def _detect_on_stacks(image, make_stack, params: PyramidParams,
                      det_params: DoGParams) -> Keypoints:
    """Shared driver: build pyramid, compute response stacks, detect,
    rescale to image coordinates."""
    import jax

    gp = gaussian_pyramid(image, params)
    chunks = []
    k = params.k
    for oct_idx, gauss in enumerate(gp.octaves):
        stack = make_stack(gauss, gp.sigmas)
        det = detect_dog_octave(stack, det_params)
        scale_factor = gp.octave_scales[oct_idx]
        sigma = params.sigma_initial * jnp.power(k, det["s"])
        K = det["x"].shape[0]
        chunks.append(Keypoints(
            xy=jnp.stack([det["x"], det["y"]], axis=-1) * scale_factor,
            scale=sigma * scale_factor,
            orientation=jnp.zeros((K,), jnp.float32),
            response=det["value"],
            descriptors=jnp.zeros((K, 128), jnp.float32),
            mask=det["mask"],
        ))
    return Keypoints(*(jnp.concatenate(parts, axis=0)
                       for parts in zip(*chunks)))


def compute_log_keypoints(image, params: PyramidParams = PyramidParams(),
                          thres: float = 0.01, capacity: int = 1024) -> Keypoints:
    dp = DoGParams(extremum_thres=thres, capacity=capacity)
    return _detect_on_stacks(image, log_stack, params, dp)


def compute_doh_keypoints(image, params: PyramidParams = PyramidParams(),
                          thres: float = 1e-5, capacity: int = 1024) -> Keypoints:
    dp = DoGParams(extremum_thres=thres, capacity=capacity, edge_test=False)
    return _detect_on_stacks(image, doh_stack, params, dp)


def detect_2d_maxima_octave(stack: jnp.ndarray, thres: float, capacity: int,
                            border: int = 1):
    """Per-scale spatial (8-neighbor) maxima of a (S, H, W) response stack
    with sub-pixel 2-D quadratic refinement. Corner-style detection where a
    scale-space extremum is too strict (Harris: the cornerness is often
    monotonic in scale) — matches the reference's corner scanning
    (reference: ImageProcessing/LocalExtremum.hpp local_maxima +
    Harris.hpp per-scale corner lists)."""
    import jax

    S, H, W = stack.shape
    pad = jnp.pad(stack, ((0, 0), (1, 1), (1, 1)), mode="edge")
    neigh = jnp.full((S, H, W), -jnp.inf, stack.dtype)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neigh = jnp.maximum(neigh, pad[:, 1 + dy: 1 + dy + H,
                                           1 + dx: 1 + dx + W])
    is_max = (stack > neigh) & (stack >= thres)
    interior = jnp.zeros((H, W), bool).at[border:H - border,
                                          border:W - border].set(True)
    is_max = is_max & interior[None]

    from sara_tpu.ops.topk import bucketed_top_k

    score = jnp.where(is_max, stack, -jnp.inf).reshape(-1)
    k_eff = min(capacity, score.shape[0])
    vals, idx = bucketed_top_k(score, k_eff)
    if k_eff < capacity:
        vals = jnp.concatenate([vals, jnp.full((capacity - k_eff,), -jnp.inf)])
        idx = jnp.concatenate([idx, jnp.zeros((capacity - k_eff,), idx.dtype)])
    valid = jnp.isfinite(vals)
    s = idx // (H * W)
    rem = idx % (H * W)
    y = rem // W
    x = rem % W

    # 2-D quadratic refinement on the 3x3 spatial patch.
    offs = jnp.arange(-1, 2)
    yy = jnp.clip(y[:, None] + offs, 0, H - 1)
    xx = jnp.clip(x[:, None] + offs, 0, W - 1)
    patch = stack[s[:, None, None], yy[:, :, None], xx[:, None, :]]  # (K,3,3)
    gy = 0.5 * (patch[:, 2, 1] - patch[:, 0, 1])
    gx = 0.5 * (patch[:, 1, 2] - patch[:, 1, 0])
    hyy = patch[:, 2, 1] + patch[:, 0, 1] - 2 * patch[:, 1, 1]
    hxx = patch[:, 1, 2] + patch[:, 1, 0] - 2 * patch[:, 1, 1]
    hxy = 0.25 * (patch[:, 2, 2] - patch[:, 2, 0]
                  - patch[:, 0, 2] + patch[:, 0, 0])
    det = hxx * hyy - hxy * hxy
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    dx_ = -(hyy * gx - hxy * gy) / det
    dy_ = -(hxx * gy - hxy * gx) / det
    dx_ = jnp.clip(dx_, -1.0, 1.0)
    dy_ = jnp.clip(dy_, -1.0, 1.0)
    return {
        "x": x.astype(jnp.float32) + dx_,
        "y": y.astype(jnp.float32) + dy_,
        "s": s.astype(jnp.float32),
        "value": patch[:, 1, 1],
        "mask": valid,
    }


def compute_harris_laplace_keypoints(image,
                                     params: PyramidParams = PyramidParams(),
                                     thres: float = 1e-8,
                                     capacity: int = 1024) -> Keypoints:
    """Harris corners per scale with spatial NMS (per-octave programs)."""
    gp = gaussian_pyramid(image, params)
    k = params.k
    chunks = []
    for oct_idx, gauss in enumerate(gp.octaves):
        stack = harris_stack(gauss, gp.sigmas)
        det = detect_2d_maxima_octave(stack, thres, capacity)
        scale_factor = gp.octave_scales[oct_idx]
        sigma = params.sigma_initial * jnp.power(k, det["s"])
        K = det["x"].shape[0]
        chunks.append(Keypoints(
            xy=jnp.stack([det["x"], det["y"]], axis=-1) * scale_factor,
            scale=sigma * scale_factor,
            orientation=jnp.zeros((K,), jnp.float32),
            response=det["value"],
            descriptors=jnp.zeros((K, 128), jnp.float32),
            mask=det["mask"],
        ))
    return Keypoints(*(jnp.concatenate(parts, axis=0)
                       for parts in zip(*chunks)))
