"""Homography estimation demo (4-point DLT + RANSAC).

Rebuild of the reference example
(reference: cpp/examples/Sara/MultiViewGeometry/
homography_estimation_example.cpp — SIFT matches, 4-point RANSAC
homography, inlier visualization).

With no second image the demo warps the input by a known homography and
checks the recovered H against it (corner transfer error).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-a", default="/root/reference/data/sunflowerField.jpg")
    ap.add_argument("--image-b", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="/tmp/sara_tpu_homography")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sara_tpu.features import SIFTParams, compute_sift_keypoints
    from sara_tpu.image.transform import warp_homography
    from sara_tpu.io.image import imread_gray
    from sara_tpu.matching import MatchParams, match_descriptors
    from sara_tpu.ransac.estimators import estimate_homography

    img_a = imread_gray(args.image_a)
    h, w = img_a.shape

    H_gt = None
    if args.image_b:
        img_b = imread_gray(args.image_b)
    else:
        H_gt = np.array([[0.95, 0.08, 12.0],
                         [-0.05, 1.02, -6.0],
                         [6e-5, -4e-5, 1.0]])
        img_b = np.asarray(warp_homography(
            jnp.asarray(img_a), jnp.asarray(np.linalg.inv(H_gt))))

    params = SIFTParams()
    ka = compute_sift_keypoints(jnp.asarray(img_a), params)
    kb = compute_sift_keypoints(jnp.asarray(img_b), params)
    m = match_descriptors(ka, kb, MatchParams(ratio=0.8))
    print(f"keypoints {int(ka.count())}/{int(kb.count())}, "
          f"matches {int(m.count())}")

    res = estimate_homography(jax.random.PRNGKey(0), ka.xy, kb.xy[m.j],
                              m.mask, threshold=3.0, num_samples=500)
    H = np.asarray(res.model)
    H /= H[2, 2]
    print(f"RANSAC: success={bool(res.success)}, "
          f"inliers {int(res.num_inliers)}/{int(m.count())}")

    if H_gt is not None:
        corners = np.array([[0, 0, 1], [w - 1, 0, 1],
                            [0, h - 1, 1], [w - 1, h - 1, 1]], float)
        pa = corners @ H.T
        pb = corners @ H_gt.T
        pa = pa[:, :2] / pa[:, 2:]
        pb = pb[:, :2] / pb[:, 2:]
        err = np.linalg.norm(pa - pb, axis=1)
        print(f"corner transfer error vs ground truth: "
              f"max {err.max():.3f} px")

    # Inlier match visualization.
    os.makedirs(args.out, exist_ok=True)
    try:
        from sara_tpu.viz.draw import draw_matches

        inl = np.asarray(res.inliers) & np.asarray(m.mask)
        draw_matches(img_a, img_b, np.asarray(ka.xy), np.asarray(kb.xy),
                     np.stack([np.arange(len(inl))[inl],
                               np.asarray(m.j)[inl]], axis=1),
                     os.path.join(args.out, "inlier_matches.png"))
        print(f"wrote {args.out}/inlier_matches.png")
    except Exception as e:
        print(f"(visualization skipped: {e})")


if __name__ == "__main__":
    main()
