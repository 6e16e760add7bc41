"""Top-level SIFT keypoint computation: detect + orient + describe.

TPU-native rebuild of the reference orchestrator
(reference: cpp/src/DO/Sara/FeatureDetectors/SIFT.cpp:27-108
``compute_sift_keypoints``; pipeline structure mirrors the reference GPU
path Shakti/Halide/SIFT/V2/Pipeline.hpp:46-178 — per-octave device programs
with fixed-capacity compaction between stages).

Each octave is one jitted program (static shapes per input resolution, so
XLA caches compilations); results are merged into a single fixed-capacity
:class:`~sara_tpu.core.types.Keypoints` with positions/scales rescaled to
input image coordinates.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from sara_tpu.core.types import Keypoints
from sara_tpu.features.dog import DoGParams, detect_dog_octave
from sara_tpu.features.orientation import (find_orientation_peaks,
                                           lowe_smooth, orientation_maps,
                                           sample_orientation_maps)
from sara_tpu.features.sift import sift_descriptors, sift_descriptors_field
from sara_tpu.image.differential import gradient
from sara_tpu.image.pyramid import PyramidParams, gaussian_pyramid, dog_pyramid


@dataclass(frozen=True)
class SIFTParams:
    """Static configuration for the SIFT pipeline (reference defaults).

    The standalone detector defaults to the -1 upsampled first octave like
    the reference (`compute_sift_keypoints` default `ImagePyramidParams()`,
    reference: FeatureDetectors/SIFT.hpp:26-33, ImageProcessing/
    ImagePyramid.hpp:33-49) — measured on the bundled 480x640 pair this
    detects 1.06x OpenCV-SIFT's keypoints at equal-or-better repeatability
    (scripts/eval_detection_quality.py). The SfM/VO pipeline overrides to
    first_octave=0 exactly as the reference does
    (SfM/BuildingBlocks/FeatureParams.hpp:10, `ImagePyramidParams(0)`).
    """

    # Per-octave capacity 4096 / total 8192 with nearest field sampling:
    # the round-3 quality harness measures kp 1.70x OpenCV, correct
    # matches 0.955x, repeatability 0.760 vs 0.695 at this configuration.
    # (Round 2 capacities >= 3072 reproducibly CRASHED the TPU worker; the
    # bisect landed on the multi-axis advanced-indexing gathers in the
    # descriptor/orientation sampling, now flat row gathers — NOTES.md.)
    # refine_iters=2: most extrema converge in one Newton step; quality
    # measured identical to the reference's 5 (probe_frontend_sweep).
    pyramid: PyramidParams = field(
        default_factory=lambda: PyramidParams(first_octave=-1))
    dog: DoGParams = field(default_factory=lambda: DoGParams(
        capacity=4096, refine_iters=2))
    max_orientations: int = 2
    total_capacity: int = 8192
    descriptor_bilinear: bool = False  # nearest sampling: 4x fewer gathers,
                                       # ~1.4x faster frontend; the 16x16
                                       # grid oversamples the 4x4 bins so
                                       # match quality is unchanged (e2e
                                       # warp tests pass either way)
    low_precision: bool = True  # bfloat16 storage for the orientation's
                                # dense binned maps and the descriptor's
                                # gathered gradient maps on TPU (the two
                                # HBM-traffic-dominated stages); detection
                                # and all normalization stay float32
    descriptor_field: bool = True  # sample descriptors from the SAME dense
                                   # blurred 36-bin orientation maps the
                                   # orientation stage builds (DAISY-style;
                                   # 64 row-gathers/keypoint instead of 256
                                   # pixel gathers and zero extra convs);
                                   # False = exact reference grid descriptor
    orientation_downsample: int = 0  # 0 = auto (2 on TPU, 1 elsewhere);
                                     # explicit 1/2 forces the map
                                     # resolution on any backend (lets the
                                     # CPU quality harness measure the
                                     # TPU approximation)
    hist_sample_nearest: bool = False  # nearest (1-row) vs bilinear
                                       # (4-row) reads of the blurred
                                       # orientation field for the
                                       # per-keypoint histogram
    desc_sample_nearest: bool = True   # same choice for the field
                                       # descriptor's 16 bin centers
                                       # (16 vs 64 rows/keypoint).
    desc_sampler: str = "gather"  # "pallas" = bulk patch-DMA kernel
                                  # (ops/patch_sampler.py): one strided
                                  # HBM->VMEM DMA per keypoint + MXU
                                  # bilinear weighting. Measured (trace,
                                  # octave-0 shape): 3.1 ms vs 9.7 ms for
                                  # XLA BILINEAR gathers — but the shipped
                                  # nearest-gather point is 2.1 ms (the
                                  # 36-channel field wastes 92/128 DMA
                                  # lanes per patch), so "gather" stays
                                  # the throughput default and "pallas"
                                  # is the bilinear-quality option.
                                  # "auto" = pallas on TPU when it fits.
    # Row-gather rate (~30 rows/us) bounds both stages on TPU. Measured on
    # the ds=2 maps the TPU uses (CPU harness, orientation_downsample=2):
    # desc-nearest costs ~2% correct matches; hist-nearest costs ~7%
    # (theta errors rotate the whole descriptor) — so descriptors sample
    # nearest, histograms bilinear.


@functools.partial(jax.jit, static_argnames=("params", "sigmas"))
def _process_octave(gauss: jnp.ndarray, dog: jnp.ndarray, params: SIFTParams,
                    sigmas: tuple):
    """One octave: extrema -> orientations -> descriptors. All fixed shapes."""
    det = detect_dog_octave(dog, params.dog)
    # The top Gaussian only feeds the last DoG level (detection stencil);
    # refined scale indices round to at most G-2, so gradients/orientation/
    # descriptor never sample it — drop it from those stages.
    gx, gy = gradient(gauss[:-1])
    cdt = (jnp.bfloat16 if params.low_precision
           and jax.default_backend() == "tpu" else None)
    ds = (params.orientation_downsample if params.orientation_downsample > 0
          else (2 if cdt is not None else 1))

    # Raw 36-channel maps: the patch-DMA descriptor sampler reinterprets
    # them as x-PACKED (S, H, W/2, 72) cells for free (row-major view) and
    # pads 72->128 itself — half the pad/DMA bytes of padding 36->128 here.
    maps = orientation_maps(gx, gy, sigmas[:-1], compute_dtype=cdt,
                            downsample=ds)
    hist = lowe_smooth(sample_orientation_maps(
        maps, det["x"], det["y"], det["s"], downsample=ds,
        bilinear=not params.hist_sample_nearest))
    theta, tvalid = find_orientation_peaks(
        hist, max_peaks=params.max_orientations)

    # Replicate each keypoint per valid orientation peak.
    K = det["x"].shape[0]
    P = params.max_orientations
    rep = lambda a: jnp.repeat(a, P)
    x = rep(det["x"])
    y = rep(det["y"])
    s = rep(det["s"])
    val = rep(det["value"])
    mask = rep(det["mask"]) & tvalid.reshape(-1)
    th = theta.reshape(-1)

    # Compact valid slots to the front before describing: only ~15% of
    # keypoints carry a second orientation peak, so describing all K*P
    # replica slots wastes most of the stage's gather work. Budget
    # K + K//4 slots (second orientations beyond that, which are rare,
    # are dropped — weakest-index last).
    K2 = K + K // 4
    order = jnp.argsort((~mask).astype(jnp.int32), stable=True)[:K2]
    x, y, s, val, th, mask = (a[order] for a in (x, y, s, val, th, mask))

    if params.descriptor_field:
        desc = sift_descriptors_field(
            maps, x, y, s, th, sigmas[:-1], downsample=ds,
            bilinear=not params.desc_sample_nearest,
            sampler=params.desc_sampler)
    else:
        desc = sift_descriptors(gx, gy, x, y, s, th, sigmas[:-1],
                                bilinear=params.descriptor_bilinear,
                                compute_dtype=cdt)
    return {"x": x, "y": y, "s": s, "value": val, "theta": th,
            "desc": desc, "mask": mask}


def compute_sift_keypoints(image: jnp.ndarray,
                           params: SIFTParams = SIFTParams()) -> Keypoints:
    """SIFT keypoints + descriptors of a (H, W) float image.

    Returns a fixed-capacity Keypoints (capacity = params.total_capacity)
    with positions in input-image pixel coordinates and absolute sigmas,
    keeping the strongest responses across octaves
    (reference rescaling: FeatureDetectors/SIFT.cpp:92-98).

    The whole computation (pyramid + every octave + merge) runs as ONE
    jitted program per image shape: on the target TPU runtime each compile
    dispatch costs ~10 s, so minimizing program count (and steady-state
    dispatch count) dominates the frontend latency budget.
    """
    return _compute_sift_jit(image, params)


@functools.partial(jax.jit, static_argnames=("params",))
def _compute_sift_jit(image: jnp.ndarray, params: SIFTParams) -> Keypoints:
    import dataclasses

    gp = gaussian_pyramid(image, params.pyramid)
    dg = dog_pyramid(gp)

    chunks = []
    for oct_idx, (gauss, dog) in enumerate(zip(gp.octaves, dg.octaves)):
        # Adaptive per-octave capacity (static per shape): small octaves
        # cannot produce anywhere near the full budget, and every slot costs
        # orientation + descriptor work downstream.
        s_, h_, w_ = dog.shape
        cap = min(params.dog.capacity, max(64, (s_ * h_ * w_) // 512))
        oct_params = dataclasses.replace(params, dog=dataclasses.replace(
            params.dog, capacity=cap))
        out = _process_octave(gauss, dog, oct_params, gp.sigmas)
        scale_factor = gp.octave_scales[oct_idx]
        sig_tab = jnp.asarray(gp.sigmas, jnp.float32)
        # Continuous sigma via log-interpolation of the per-scale table.
        k = float(params.pyramid.k)
        sigma = params.pyramid.sigma_initial * jnp.power(k, out["s"])
        chunks.append(Keypoints(
            xy=jnp.stack([out["x"], out["y"]], axis=-1) * scale_factor,
            scale=sigma * scale_factor,
            orientation=out["theta"],
            response=out["value"],
            descriptors=out["desc"],
            mask=out["mask"],
        ))

    merged = Keypoints(*(jnp.concatenate(parts, axis=0) for parts in zip(*chunks)))

    # Keep the strongest total_capacity responses (masked-out rows last).
    cap = params.total_capacity
    score = jnp.where(merged.mask, jnp.abs(merged.response), -jnp.inf)
    if merged.capacity <= cap:
        pad = cap - merged.capacity
        if pad:
            merged = Keypoints(*(jnp.concatenate(
                [f, jnp.zeros((pad,) + f.shape[1:], f.dtype)], axis=0)
                for f in merged))
        return merged
    from sara_tpu.ops.topk import chunked_top_k

    _, idx = chunked_top_k(score, cap)
    return Keypoints(
        xy=merged.xy[idx],
        scale=merged.scale[idx],
        orientation=merged.orientation[idx],
        response=merged.response[idx],
        descriptors=merged.descriptors[idx],
        mask=merged.mask[idx],
    )
