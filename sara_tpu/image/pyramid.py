"""Gaussian / DoG scale-space pyramids.

TPU-native rebuild of the reference pyramid machinery
(reference: cpp/src/DO/Sara/ImageProcessing/GaussianPyramid.hpp:34-151,
ImagePyramid.hpp:29-206). Key design change: each octave is a single
``(S, H_o, W_o)`` array ("padded octave stack") rather than a list of images,
so all per-scale work (DoG, extrema stencils, gradients) is one vectorized
program per octave. Octave shapes are static at trace time, so every octave
compiles once per input resolution and is cached.

Defaults mirror the reference: sigma_camera = 0.5, sigma_initial = 1.6,
3 scales per octave (=> 6 Gaussians per octave), k = 2^(1/3), first octave 0
for the SfM pipeline (-1 upsamples by 2 first)
(reference: ImagePyramid.hpp:33-49, SfM/BuildingBlocks/FeatureParams.hpp:10).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, NamedTuple

import jax
import jax.numpy as jnp

from sara_tpu.image.filtering import gaussian_blur
from sara_tpu.image.transform import downscale2, upscale2


@dataclass(frozen=True)
class PyramidParams:
    """Static pyramid configuration (hashable — usable as a jit static arg)."""

    first_octave: int = 0           # -1 upsamples the input by 2 first.
    scales_per_octave: int = 3      # "S"; octave holds S+3 Gaussians.
    sigma_camera: float = 0.5
    sigma_initial: float = 1.6
    border: int = 8                 # image border excluded from detection.
    max_octaves: int = 99

    @property
    def k(self) -> float:
        return 2.0 ** (1.0 / self.scales_per_octave)

    @property
    def gaussians_per_octave(self) -> int:
        return self.scales_per_octave + 3

    def num_octaves(self, h: int, w: int) -> int:
        if self.first_octave < 0:
            h, w = h * 2, w * 2
        n = int(math.floor(math.log2(min(h, w) / (2.0 * self.border)))) + 1
        return max(1, min(n, self.max_octaves))


class GaussianPyramid(NamedTuple):
    """Octave stacks + geometry metadata.

    octaves:       list of (S+3, H_o, W_o) arrays (Gaussian) or (S+2, ...) (DoG).
    octave_scales: tuple of floats — pixel scaling factor of each octave
                   relative to the original image (2^octave_index).
    sigmas:        (S+3,) relative sigmas of the scales within an octave;
                   absolute sigma at (octave o, scale s) = sigmas[s] * 2^o.
    """

    octaves: List[jnp.ndarray]
    octave_scales: tuple
    sigmas: tuple


def gaussian_pyramid(image: jnp.ndarray, params: PyramidParams = PyramidParams()) -> GaussianPyramid:
    """Build the Gaussian pyramid of a (H, W) float image.

    Follows the reference construction exactly
    (reference: GaussianPyramid.hpp:34-125): optional initial x2 upsample,
    initial blur from sigma_camera to sigma_initial, then per octave an
    incremental blur cascade; the next octave is seeded by decimating the
    scale whose sigma is exactly 2 * sigma_initial (index S).
    """
    p = params
    k = p.k
    S = p.scales_per_octave
    G = p.gaussians_per_octave

    x = image.astype(jnp.float32)
    if p.first_octave < 0:
        x = upscale2(x)
        camera = 2.0 * p.sigma_camera
    else:
        camera = p.sigma_camera

    # Bring the input to sigma_initial.
    sigma0 = p.sigma_initial
    delta = math.sqrt(max(sigma0 * sigma0 - camera * camera, 1e-6))
    x = gaussian_blur(x, delta)

    h, w = x.shape
    n_oct = p.num_octaves(image.shape[0], image.shape[1])

    sigmas = tuple(sigma0 * (k ** s) for s in range(G))
    octaves = []
    scales = []
    base = x
    use_grouped = jax.default_backend() == "tpu"
    for o in range(n_oct):
        if use_grouped:
            stack = _octave_from_base_grouped(base, sigma0, k, G)
        else:
            levels = [base]
            for s in range(1, G):
                # sigma_incr so that sigma_{s-1} (+) sigma_incr = sigma_s.
                sig_prev = sigma0 * (k ** (s - 1))
                sig_incr = sig_prev * math.sqrt(k * k - 1.0)
                levels.append(gaussian_blur(levels[-1], sig_incr))
            stack = jnp.stack(levels, axis=0)
        octaves.append(stack)
        scales.append(2.0 ** (o + p.first_octave))
        # Seed next octave: scale index S has sigma = 2 * sigma0.
        base = downscale2(stack[S])
        if min(base.shape) < 2 * p.border:
            break
    return GaussianPyramid(octaves, tuple(scales[: len(octaves)]), sigmas)


def _octave_from_base_grouped(base: jnp.ndarray, sigma0: float, k: float,
                              G: int) -> jnp.ndarray:
    """All octave scales directly from the base scale via MXU band matmuls.

    Two design moves away from the reference's incremental conv cascade
    (2*(G-1) dependent convs per octave):
    - semigroup collapse: scale s comes straight from scale 0 with
      sigma_direct = sqrt(sigma_s^2 - sigma_0^2), so the G-1 blurs are
      independent;
    - each separable blur is a pair of banded-Toeplitz MATMULS
      (H, H) @ (H, W) @ (W, W) — grouped depthwise convs lower to a slow
      per-group VPU path on TPU, while the band matrices ride the MXU
      (float32 to keep the DoG's 0.01 detection threshold meaningful).
    """
    import numpy as np

    from sara_tpu.image.filtering import band_matrix as _band_matrix

    H, W = base.shape
    sig_direct = [math.sqrt(max((sigma0 * k ** s) ** 2 - sigma0 ** 2, 1e-8))
                  for s in range(1, G)]
    levels = [base]
    for sd in sig_direct:
        r = max(1, int(math.ceil(4.0 * sd)))
        xs = np.arange(-r, r + 1, dtype=np.float64)
        kk = np.exp(-(xs * xs) / (2.0 * sd * sd))
        taps = kk / kk.sum()
        Bw = jnp.asarray(_band_matrix(taps, W, 1), base.dtype)
        Bh = jnp.asarray(_band_matrix(taps, H, 1), base.dtype)
        x1 = jnp.einsum("hw,wv->hv", base, Bw,
                        preferred_element_type=jnp.float32)
        levels.append(jnp.einsum("hu,hv->uv", Bh, x1,
                                 preferred_element_type=jnp.float32)
                      .astype(base.dtype))
    return jnp.stack(levels, axis=0)


def dog_pyramid(gp: GaussianPyramid) -> GaussianPyramid:
    """Difference-of-Gaussians: adjacent-scale differences per octave
    (reference: GaussianPyramid.hpp:132-151)."""
    dogs = [oct[1:] - oct[:-1] for oct in gp.octaves]
    return GaussianPyramid(dogs, gp.octave_scales, gp.sigmas)


def laplacian_pyramid(gp: GaussianPyramid, params: PyramidParams = PyramidParams()) -> GaussianPyramid:
    """Scale-normalized LoG approximation per octave
    (reference: GaussianPyramid.hpp:156-180)."""
    from sara_tpu.image.differential import laplacian

    outs = []
    for oct in gp.octaves:
        sig = jnp.asarray(gp.sigmas, oct.dtype)[: oct.shape[0], None, None]
        outs.append(laplacian(oct) * sig * sig)
    return GaussianPyramid(outs, gp.octave_scales, gp.sigmas)
