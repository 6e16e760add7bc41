"""Knob sweep for the worst-scene match-quality gap (VERDICT r4 weak #4:
dog.jpg correct_match_ratio 0.744 vs 0.984 on the primary scene, measured
at the TPU operating point ds=2 + nearest descriptor sampling).

Runs the CPU quality harness (eval_detection_quality) on the weak scenes
across the sampling knobs the TPU path can actually ship, to find which
knob closes the gap BEFORE spending TPU compile cycles on it.

Usage: python scripts/probe_dog_quality.py [--scenes dog.jpg,...]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import eval_detection_quality as q


def run_with(img_a, img_b, ds, desc_nearest, hist_nearest, sampler="gather",
             cap=8192):
    import jax.numpy as jnp

    from sara_tpu.features import SIFTParams, compute_sift_keypoints
    from sara_tpu.features.dog import DoGParams
    from sara_tpu.image.pyramid import PyramidParams
    from sara_tpu.matching import MatchParams, match_descriptors

    params = SIFTParams(
        pyramid=PyramidParams(first_octave=-1),
        dog=DoGParams(capacity=cap // 2),
        total_capacity=cap,
        orientation_downsample=ds,
        desc_sample_nearest=desc_nearest,
        hist_sample_nearest=hist_nearest,
        desc_sampler=sampler,
    )
    ka = compute_sift_keypoints(jnp.asarray(img_a), params)
    kb = compute_sift_keypoints(jnp.asarray(img_b), params)
    m = match_descriptors(ka, kb, MatchParams(ratio=0.8))

    def unpack(k):
        mask = np.asarray(k.mask)
        return np.asarray(k.xy)[mask], mask

    xy_a, mask_a = unpack(ka)
    xy_b, mask_b = unpack(kb)
    ia = np.flatnonzero(mask_a)
    remap_a = {g: i for i, g in enumerate(ia)}
    ib = np.flatnonzero(mask_b)
    remap_b = {g: i for i, g in enumerate(ib)}
    mm = np.asarray(m.mask)
    mi = np.asarray(m.i)[mm]
    mj = np.asarray(m.j)[mm]
    pairs = np.asarray([[remap_a[a], remap_b[b]] for a, b in zip(mi, mj)
                        if a in remap_a and b in remap_b])
    return xy_a, xy_b, pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="dog.jpg,GuardOnBlonde.tif,"
                    "sunflowerField.jpg")
    ap.add_argument("--cap", type=int, default=8192)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import PIL.Image

    configs = [
        ("prod_tpu: ds2 desc-near hist-bilin", dict(ds=2, desc_nearest=True,
                                                    hist_nearest=False)),
        ("ds2 desc-BILIN hist-bilin", dict(ds=2, desc_nearest=False,
                                           hist_nearest=False)),
        ("ds1 desc-near hist-bilin", dict(ds=1, desc_nearest=True,
                                          hist_nearest=False)),
        ("ds1 desc-BILIN hist-bilin", dict(ds=1, desc_nearest=False,
                                           hist_nearest=False)),
    ]

    for name in args.scenes.split(","):
        im = np.asarray(PIL.Image.open(f"/root/reference/data/{name}")
                        .convert("L").resize((640, 480)), np.float32) / 255.0
        h, w = im.shape
        H = q.make_warp(h, w)
        warped = q.warp_image(im, H)
        xy_cv_a, xy_cv_b, pairs_cv, _ = q.run_opencv(im, warped)
        cor_cv, n_cv = q.match_quality(xy_cv_a, xy_cv_b, pairs_cv, H)
        print(json.dumps({"scene": name, "opencv_correct": cor_cv,
                          "opencv_matches": n_cv}), flush=True)
        for label, kw in configs:
            t0 = time.perf_counter()
            xy_a, xy_b, pairs = run_with(im, warped, cap=args.cap, **kw)
            cor, n = q.match_quality(xy_a, xy_b, pairs, H)
            rep, _ = q.repeatability(xy_a, xy_b, H, h, w)
            print(json.dumps({
                "scene": name, "config": label,
                "correct": cor, "matches": n,
                "correct_ratio_vs_cv": round(cor / max(cor_cv, 1), 4),
                "repeatability": round(rep, 4),
                "wall_s": round(time.perf_counter() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
