"""Two-view demo (BASELINE config 1): SIFT detect + match + RANSAC
homography on the bundled image pair.

Rebuild of the reference examples
(reference: cpp/examples/Sara/MultiViewGeometry/homography_estimation_example.cpp,
FeatureMatching examples).

Usage: python examples/two_view_demo.py [--out out_dir] [--width 640]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sara_tpu_two_view")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from sara_tpu.features import compute_sift_keypoints, SIFTParams
    from sara_tpu.io.datasets import load_image_pair
    from sara_tpu.matching import match_descriptors, MatchParams
    from sara_tpu.ransac import estimate_homography
    from sara_tpu.viz import draw_keypoints, draw_matches

    os.makedirs(args.out, exist_ok=True)
    a, b = load_image_pair(max_width=args.width)
    print(f"images: {a.shape} / {b.shape}")

    t0 = time.perf_counter()
    ka = compute_sift_keypoints(jnp.asarray(a))
    kb = compute_sift_keypoints(jnp.asarray(b))
    print(f"keypoints: {int(ka.count())} / {int(kb.count())} "
          f"({time.perf_counter()-t0:.1f}s incl. compile)")

    m = match_descriptors(ka, kb, MatchParams(ratio=0.8))
    print(f"matches: {int(m.count())}")

    u = ka.xy
    v = kb.xy[m.j]
    res = estimate_homography(jax.random.PRNGKey(0), u, v, m.mask,
                              threshold=4.0, num_samples=1000)
    print(f"homography inliers: {int(res.num_inliers)} "
          f"(success={bool(res.success)})")

    draw_keypoints(a, ka, os.path.join(args.out, "keypoints_a.png"))
    draw_keypoints(b, kb, os.path.join(args.out, "keypoints_b.png"))
    draw_matches(a, b, ka, kb, m, os.path.join(args.out, "matches.png"))
    print(f"wrote visualizations to {args.out}")


if __name__ == "__main__":
    main()
