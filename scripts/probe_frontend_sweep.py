"""Frontend perf/quality sweep (round-3 item 1b: close the roofline gap).

Hypothesis from the round-2 stage probes: per-frame device time is
dominated by per-op dispatch/scheduling overhead multiplied across
7 octaves x (top-k, 5-iteration refinement fori_loop, orientation sample,
descriptor gathers), not by FLOPs. This sweep measures configs that cut
the op count:

  base        — current defaults (fo=-1, cap 3072, 7 octaves, refine 5)
  oct4        — max_octaves=4 (the 3 smallest octaves carry few keypoints)
  refine2     — refine_iters=2 (most extrema converge in 1 Newton step)
  oct4+ref2   — both

Usage:
  python probe_frontend_sweep.py quality   (CPU: quality per config)
  python probe_frontend_sweep.py time      (TPU: warm ms/frame per config)
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

MODE = sys.argv[1] if len(sys.argv) > 1 else "time"


def configs():
    from sara_tpu.features.api import SIFTParams
    from sara_tpu.features.dog import DoGParams
    from sara_tpu.image.pyramid import PyramidParams

    base = SIFTParams()
    out = {
        "base": base,
        "oct4": dataclasses.replace(base, pyramid=dataclasses.replace(
            base.pyramid, max_octaves=4)),
        "refine2": dataclasses.replace(base, dog=dataclasses.replace(
            base.dog, refine_iters=2)),
        "oct4+ref2": dataclasses.replace(
            base,
            pyramid=dataclasses.replace(base.pyramid, max_octaves=4),
            dog=dataclasses.replace(base.dog, refine_iters=2)),
        # The round-2 parity-measured config (eval_detection_quality
        # defaults): kp 1.06x / correct 1.09x OpenCV.
        "cap4096": dataclasses.replace(
            base, dog=dataclasses.replace(base.dog, capacity=4096),
            total_capacity=8192),
        "cap4096+o4r2": dataclasses.replace(
            base,
            pyramid=dataclasses.replace(base.pyramid, max_octaves=4),
            dog=dataclasses.replace(base.dog, capacity=4096,
                                    refine_iters=2),
            total_capacity=8192),
    }
    return out


def main_quality():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import eval_detection_quality as q
    import jax.numpy as jnp
    import PIL.Image

    from sara_tpu.features import compute_sift_keypoints
    from sara_tpu.matching import MatchParams, match_descriptors

    img = PIL.Image.open("/root/reference/data/sunflowerField.jpg")
    img = np.asarray(img.convert("L").resize((640, 480)), np.float32) / 255.0
    h, w = img.shape
    H = q.make_warp(h, w)
    warped = q.warp_image(img, H)
    xy_cv_a, xy_cv_b, pairs_cv, _ = q.run_opencv(img, warped)
    cor_cv, _ = q.match_quality(xy_cv_a, xy_cv_b, pairs_cv, H)
    print(f"opencv: kp {len(xy_cv_a)} correct {cor_cv}", flush=True)

    for name, p in configs().items():
        ka = compute_sift_keypoints(jnp.asarray(img), p)
        kb = compute_sift_keypoints(jnp.asarray(warped), p)
        m = match_descriptors(ka, kb, MatchParams(ratio=0.8))
        sel_a = np.asarray(ka.mask)
        sel_b = np.asarray(kb.mask)
        xy_a = np.asarray(ka.xy)[sel_a]
        xy_b = np.asarray(kb.xy)[sel_b]
        remap_a = np.cumsum(sel_a) - 1
        remap_b = np.cumsum(sel_b) - 1
        mm = np.asarray(m.mask)
        mi = remap_a[np.asarray(m.i)[mm]]
        mj = remap_b[np.asarray(m.j)[mm]]
        cor, _ = q.match_quality(xy_a, xy_b, np.stack([mi, mj], 1), H)
        rep, _ = q.repeatability(xy_a, xy_b, H, h, w)
        print(f"{name:10s} kp {len(xy_a):5d} ({len(xy_a)/len(xy_cv_a):.3f}x) "
              f"correct {cor:5d} ({cor/max(cor_cv,1):.3f}x) rep {rep:.3f}",
              flush=True)


def main_time():
    import jax
    import jax.numpy as jnp

    from sara_tpu.features import compute_sift_keypoints

    print("backend:", jax.default_backend(), flush=True)
    import PIL.Image

    img = PIL.Image.open("/root/reference/data/sunflowerField.jpg")
    a = jnp.asarray(np.asarray(img.convert("L").resize((640, 480)),
                               np.float32) / 255.0)
    for name, p in configs().items():
        t0 = time.perf_counter()
        kp = compute_sift_keypoints(a, p)
        n = int(kp.count())
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            kp = compute_sift_keypoints(a, p)
            n = int(kp.count())
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:10s} {dt:7.1f} ms/frame warm  ({n} kp, "
              f"compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    (main_quality if MODE == "quality" else main_time)()
