"""Five-point essential matrix walkthrough (minimal-solver demo).

Rebuild of the reference example
(reference: cpp/examples/Sara/MultiViewGeometry/essential_5_point_example.cpp
— detect SIFT on an image pair, match, run the 5-point solver inside RANSAC,
recover (R, t), triangulate, and report epipolar residuals).

Runs on the bundled sunflowerField image against a known synthetic warp of
itself when no second view is given, so the recovered geometry can be
checked against ground truth.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-a", default="/root/reference/data/sunflowerField.jpg")
    ap.add_argument("--image-b", default=None,
                    help="second view (default: synthetic rotated view of "
                         "--image-a with known ground truth)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--samples", type=int, default=500)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sara_tpu.features import SIFTParams, compute_sift_keypoints
    from sara_tpu.io.image import imread_gray
    from sara_tpu.matching import MatchParams, match_descriptors
    from sara_tpu.mvg.two_view import (sampson_epipolar_distance,
                                       triangulate_linear)
    from sara_tpu.ransac import estimate_relative_pose

    img_a = imread_gray(args.image_a)
    h, w = img_a.shape
    K = np.array([[0.9 * w, 0.0, w / 2], [0.0, 0.9 * w, h / 2], [0, 0, 1.0]])

    if args.image_b:
        img_b = imread_gray(args.image_b)
        R_gt = t_gt = None
    else:
        # Synthetic second view: pure-rotation homography warp with a known
        # relative rotation (5 deg yaw) + virtual translation via a plane-
        # induced homography so the 5-point problem is well posed.
        from sara_tpu.core.lie import so3_exp
        from sara_tpu.image.transform import warp_homography

        R_gt = np.asarray(so3_exp(jnp.asarray([0.02, 0.08, 0.01])))
        t_gt = np.array([0.08, 0.0, 0.02])
        n_plane = np.array([0.0, 0.0, 1.0])
        d_plane = 4.0
        H_gt = K @ (R_gt + np.outer(t_gt, n_plane) / d_plane) @ np.linalg.inv(K)
        img_b = np.asarray(warp_homography(
            jnp.asarray(img_a), jnp.asarray(np.linalg.inv(H_gt))))

    print(f"views: {img_a.shape} / {img_b.shape}")
    params = SIFTParams()
    ka = compute_sift_keypoints(jnp.asarray(img_a), params)
    kb = compute_sift_keypoints(jnp.asarray(img_b), params)
    print(f"keypoints: {int(ka.count())} / {int(kb.count())}")

    m = match_descriptors(ka, kb, MatchParams(ratio=0.8))
    print(f"putative matches: {int(m.count())}")

    key = jax.random.PRNGKey(0)
    res, R, t = estimate_relative_pose(
        key, ka.xy, kb.xy[m.j], m.mask, jnp.asarray(K), jnp.asarray(K),
        threshold_px=2.0, num_samples=args.samples, min_inliers=30)
    n_inl = int(res.num_inliers)
    print(f"5-point RANSAC: success={bool(res.success)}, "
          f"inliers {n_inl}/{int(m.count())}")

    # Epipolar residuals of the inliers (normalized coordinates).
    Kinv = np.linalg.inv(K)
    ua = np.asarray(ka.xy)
    ub = np.asarray(kb.xy)[np.asarray(m.j)]
    un = (np.c_[ua, np.ones(len(ua))] @ Kinv.T)[:, :2]
    vn = (np.c_[ub, np.ones(len(ub))] @ Kinv.T)[:, :2]
    d = np.asarray(sampson_epipolar_distance(
        res.model, jnp.asarray(un), jnp.asarray(vn)))
    inl = np.asarray(res.inliers)
    print(f"median Sampson residual (inliers): {np.median(d[inl]):.2e}")

    R, t = np.asarray(R), np.asarray(t)
    t = t / np.linalg.norm(t)
    if R_gt is not None:
        rerr = np.degrees(np.arccos(np.clip((np.trace(R.T @ R_gt) - 1) / 2,
                                            -1, 1)))
        terr = np.degrees(np.arccos(np.clip(
            abs(t @ (t_gt / np.linalg.norm(t_gt))), -1, 1)))
        print(f"vs ground truth: rotation err {rerr:.3f} deg, "
              f"translation direction err {terr:.3f} deg")

    # Triangulate the inliers and report cheirality.
    ra = np.c_[un, np.ones(len(un))]
    rb = np.c_[vn, np.ones(len(vn))]
    X, d1, d2 = triangulate_linear(jnp.asarray(R), jnp.asarray(t),
                                   jnp.asarray(ra), jnp.asarray(rb))
    cheiral = np.asarray((d1 > 0) & (d2 > 0)) & inl
    print(f"triangulated {int(cheiral.sum())} points in front of both views")


if __name__ == "__main__":
    main()
