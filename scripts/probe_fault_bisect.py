"""Bisect the capacity-3072 TPU kernel fault: run growing prefixes of the
fo=-1 SIFT program in SEPARATE processes (a fault kills the TPU worker).

Usage: python probe_fault_bisect.py <stage>
stages: detect, orient, peaks, compact, desc, merge
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

STAGE = sys.argv[1] if len(sys.argv) > 1 else "detect"
CAP = int(sys.argv[2]) if len(sys.argv) > 2 else 3072


def main():
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp
    import PIL.Image

    from sara_tpu.features.api import SIFTParams
    from sara_tpu.features.dog import DoGParams, detect_dog_octave
    from sara_tpu.features.orientation import (find_orientation_peaks,
                                               lowe_smooth, orientation_maps,
                                               sample_orientation_maps)
    from sara_tpu.features.sift import sift_descriptors_field
    from sara_tpu.image.differential import gradient
    from sara_tpu.image.pyramid import (PyramidParams, dog_pyramid,
                                        gaussian_pyramid)

    print("backend:", jax.default_backend(), "stage:", STAGE, "cap:", CAP,
          flush=True)

    img = PIL.Image.open("/root/reference/data/sunflowerField.jpg")
    img = img.convert("L").resize((640, 480))
    a = jnp.asarray(np.asarray(img, np.float32) / 255.0)

    params = SIFTParams(dog=DoGParams(capacity=CAP))

    @functools.partial(jax.jit, static_argnames=("stage", "p"))
    def prog(image, stage=STAGE, p=params):
        gp = gaussian_pyramid(image, p.pyramid)
        dg = dog_pyramid(gp)
        acc = 0.0
        for oct_idx, (gauss, dog) in enumerate(zip(gp.octaves, dg.octaves)):
            s_, h_, w_ = dog.shape
            cap = min(p.dog.capacity, max(64, (s_ * h_ * w_) // 512))
            det = detect_dog_octave(dog, dataclasses.replace(p.dog,
                                                             capacity=cap))
            if stage == "detect":
                acc += jnp.sum(det["x"]) + jnp.sum(det["mask"])
                continue
            gx, gy = gradient(gauss[:-1])
            cdt = jnp.bfloat16 if jax.default_backend() == "tpu" else None
            ds = 2 if cdt is not None else 1
            maps = orientation_maps(gx, gy, gp.sigmas[:-1], compute_dtype=cdt,
                                    downsample=ds)
            if stage == "orient":
                acc += sum(jnp.sum(m.astype(jnp.float32)) for m in [maps]) \
                    if not isinstance(maps, (list, tuple)) else \
                    sum(jnp.sum(m.astype(jnp.float32)) for m in maps)
                continue
            hist = lowe_smooth(sample_orientation_maps(
                maps, det["x"], det["y"], det["s"], downsample=ds))
            theta, tvalid = find_orientation_peaks(
                hist, max_peaks=p.max_orientations)
            if stage == "peaks":
                acc += jnp.sum(theta) + jnp.sum(tvalid)
                continue
            K = det["x"].shape[0]
            P = p.max_orientations
            rep = lambda arr: jnp.repeat(arr, P)
            x = rep(det["x"])
            y = rep(det["y"])
            s = rep(det["s"])
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

    if STAGE == "merge":
        from sara_tpu.features import compute_sift_keypoints

        t0 = time.perf_counter()
        ka = compute_sift_keypoints(a, params)
        n = int(ka.count())
        print(f"merge OK: {n} kp ({time.perf_counter()-t0:.1f}s)", flush=True)
        return

    t0 = time.perf_counter()
    out = float(prog(a))
    print(f"{STAGE} OK: acc={out:.3f} ({time.perf_counter()-t0:.1f}s)",
          flush=True)


if __name__ == "__main__":
    main()
