"""Fine-grained cumulative-prefix timing of the SIFT frontend on TPU.

Each prefix is its own jitted program with honest host-fetch sync; the
DELTA between consecutive prefixes attributes time to one stage (XLA may
reschedule across prefixes — trust the big deltas, not the small ones).

Usage: python probe_sift_prefix.py [cap] [refine_iters]
"""

import dataclasses
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CAP = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
REFINE = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def main():
    import jax
    import jax.numpy as jnp
    import PIL.Image

    from sara_tpu.features.api import SIFTParams, _compute_sift_jit
    from sara_tpu.features.dog import (DoGParams, _stencil_extrema,
                                       detect_dog_octave)
    from sara_tpu.features.orientation import (find_orientation_peaks,
                                               lowe_smooth, orientation_maps,
                                               sample_orientation_maps)
    from sara_tpu.features.sift import sift_descriptors_field
    from sara_tpu.image.differential import gradient
    from sara_tpu.image.pyramid import dog_pyramid, gaussian_pyramid

    print("backend:", jax.default_backend(), "cap:", CAP,
          "refine:", REFINE, flush=True)
    img = PIL.Image.open("/root/reference/data/sunflowerField.jpg")
    a = jnp.asarray(np.asarray(img.convert("L").resize((640, 480)),
                               np.float32) / 255.0)
    params = SIFTParams(dog=DoGParams(capacity=CAP, refine_iters=REFINE))

    def per_octave(stage, image, p):
        gp = gaussian_pyramid(image, p.pyramid)
        if stage == "pyramid":
            return sum(jnp.sum(o[-1]) for o in gp.octaves)
        dg = dog_pyramid(gp)
        if stage == "dog":
            return sum(jnp.sum(o[-1]) for o in dg.octaves)
        acc = 0.0
        for gauss, dog in zip(gp.octaves, dg.octaves):
            s_, h_, w_ = dog.shape
            cap = min(p.dog.capacity, max(64, (s_ * h_ * w_) // 512))
            if stage == "stencil":
                mx, mn = _stencil_extrema(dog)
                acc += jnp.sum(mx) + jnp.sum(mn)
                continue
            det = detect_dog_octave(dog, dataclasses.replace(
                p.dog, capacity=cap))
            if stage == "detect":
                acc += jnp.sum(det["x"]) + jnp.sum(det["mask"])
                continue
            gx, gy = gradient(gauss[:-1])
            if stage == "gradient":
                acc += jnp.sum(gx) + jnp.sum(gy)
                continue
            cdt = jnp.bfloat16 if jax.default_backend() == "tpu" else None
            ds = 2 if cdt is not None else 1
            maps = orientation_maps(gx, gy, gp.sigmas[:-1],
                                    compute_dtype=cdt, downsample=ds)
            if stage == "orient_maps":
                acc += jnp.sum(maps.astype(jnp.float32))
                continue
            hist = lowe_smooth(sample_orientation_maps(
                maps, det["x"], det["y"], det["s"], downsample=ds))
            theta, tvalid = find_orientation_peaks(
                hist, max_peaks=p.max_orientations)
            if stage == "orient_peaks":
                acc += jnp.sum(theta) + jnp.sum(tvalid)
                continue
            K = det["x"].shape[0]
            P = p.max_orientations
            rep = lambda arr: jnp.repeat(arr, P)
            x, y, s = rep(det["x"]), rep(det["y"]), rep(det["s"])
            mask = rep(det["mask"]) & tvalid.reshape(-1)
            th = theta.reshape(-1)
            K2 = K + K // 4
            order = jnp.argsort((~mask).astype(jnp.int32), stable=True)[:K2]
            x, y, s, th, mask = (arr[order] for arr in (x, y, s, th, mask))
            if stage == "compact":
                acc += jnp.sum(x) + jnp.sum(mask)
                continue
            desc = sift_descriptors_field(maps, x, y, s, th, gp.sigmas[:-1],
                                          downsample=ds)
            acc += jnp.sum(desc.astype(jnp.float32)) + jnp.sum(mask)
        return acc

    stages = ["pyramid", "dog", "stencil", "detect", "gradient",
              "orient_maps", "orient_peaks", "compact", "desc"]
    prev = 0.0
    for st in stages:
        fn = jax.jit(functools.partial(per_octave, st),
                     static_argnames=("p",))
        t0 = time.perf_counter()
        float(fn(a, params))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(8):
            float(fn(a, params))
        dt = (time.perf_counter() - t0) / 8 * 1e3
        print(f"{st:14s} cum {dt:7.1f} ms  delta {dt-prev:7.1f} ms  "
              f"(compile {compile_s:.0f}s)", flush=True)
        prev = dt

    t0 = time.perf_counter()
    kp = _compute_sift_jit(a, params)
    float(kp.xy.sum())
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(8):
        kp = _compute_sift_jit(a, params)
        float(kp.xy.sum())
    dt = (time.perf_counter() - t0) / 8 * 1e3
    print(f"{'full+merge':14s} cum {dt:7.1f} ms  delta {dt-prev:7.1f} ms  "
          f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
