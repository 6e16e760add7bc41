#!/usr/bin/env python
"""Per-stage SIFT timing probe on the live TPU.

Times cumulative prefixes of the frontend program (pyramid -> +detect ->
+orientation -> +descriptor -> +match), each as its own jitted program with
honest host-fetch synchronization (block_until_ready is unreliable on this
runtime — NOTES.md). Mirrors the reference's per-stage logs
(reference: cpp/src/DO/Sara/FeatureDetectors/SIFT.cpp:56-105).

Run ALONE (never alongside another TPU client or pytest): each new program
costs a fresh ~10-90 s compile; warm cache makes re-runs cheap.
"""

import dataclasses
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from bench import load_pair
    from sara_tpu.features.api import SIFTParams, _compute_sift_jit
    from sara_tpu.features.dog import detect_dog_octave
    from sara_tpu.features.orientation import dominant_orientations
    from sara_tpu.image.differential import gradient
    from sara_tpu.image.pyramid import gaussian_pyramid, dog_pyramid
    from sara_tpu.matching import match_descriptors, MatchParams

    log("backend:", jax.default_backend())
    a, _b = load_pair()
    img = jnp.asarray(a)
    params = SIFTParams()

    @functools.partial(jax.jit, static_argnames=("p",))
    def stage_pyramid(x, p=params):
        gp = gaussian_pyramid(x, p.pyramid)
        return sum(jnp.sum(o[-1]) for o in gp.octaves)

    @functools.partial(jax.jit, static_argnames=("p",))
    def stage_detect(x, p=params):
        gp = gaussian_pyramid(x, p.pyramid)
        dg = dog_pyramid(gp)
        acc = 0.0
        for gauss, dog in zip(gp.octaves, dg.octaves):
            s_, h_, w_ = dog.shape
            cap = min(p.dog.capacity, max(64, (s_ * h_ * w_) // 512))
            det = detect_dog_octave(dog, dataclasses.replace(p.dog, capacity=cap))
            acc = acc + jnp.sum(det["x"]) + jnp.sum(det["value"])
        return acc

    @functools.partial(jax.jit, static_argnames=("p",))
    def stage_orient(x, p=params):
        gp = gaussian_pyramid(x, p.pyramid)
        dg = dog_pyramid(gp)
        acc = 0.0
        for gauss, dog in zip(gp.octaves, dg.octaves):
            s_, h_, w_ = dog.shape
            cap = min(p.dog.capacity, max(64, (s_ * h_ * w_) // 512))
            det = detect_dog_octave(dog, dataclasses.replace(p.dog, capacity=cap))
            gx, gy = gradient(gauss)
            theta, tvalid = dominant_orientations(
                gx, gy, det["x"], det["y"], det["s"], gp.sigmas,
                max_peaks=p.max_orientations)
            acc = acc + jnp.sum(theta)
        return acc

    @functools.partial(jax.jit, static_argnames=("p",))
    def stage_full(x, p=params):
        kp = _compute_sift_jit(x, p)
        return jnp.sum(kp.descriptors) + jnp.sum(kp.xy)

    stages = [("pyramid", stage_pyramid), ("+detect", stage_detect),
              ("+orient", stage_orient), ("+descr", stage_full)]

    results = {}
    for name, fn in stages:
        t0 = time.perf_counter()
        float(fn(img))
        log(f"{name}: compile+first {time.perf_counter()-t0:.1f}s")
        iters = 8
        t0 = time.perf_counter()
        for _ in range(iters):
            float(fn(img))
        dt = (time.perf_counter() - t0) / iters * 1e3
        results[name] = dt
        log(f"{name}: {dt:.1f} ms")

    prev = 0.0
    for name, dt in results.items():
        log(f"STAGE {name:8s} cum {dt:7.1f} ms  delta {dt - prev:7.1f} ms")
        prev = dt


if __name__ == "__main__":
    main()
