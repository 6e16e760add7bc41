"""Global (unordered) SfM demo: rendered multi-view scene -> SIFT ->
pairwise matching + E-RANSAC -> rotation/translation averaging ->
multi-view triangulation -> global bundle adjustment -> PLY export.

The reference reaches reconstruction only incrementally
(reference: cpp/src/DO/Sara/SfM/Odometry/OdometryPipeline.cpp:29-423); the
global pipeline is the TPU-native scalable design for unordered
collections (BASELINE configs 4/5), batching the pair stage as chunks of
vmapped match+RANSAC programs.

Usage: python examples/global_sfm_demo.py [--views 8] [--out dir] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--out", default="/tmp/sara_tpu_global_sfm")
    ap.add_argument("--pair-chunk", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from render3d import make_room, render
    from sara_tpu.features import compute_sift_keypoints, SIFTParams
    from sara_tpu.sfm.global_sfm import GlobalSfMConfig, run_global_sfm
    from sara_tpu.sfm.pointcloud import write_ply
    from sara_tpu.utils import ate_rmse

    os.makedirs(args.out, exist_ok=True)
    K = np.array([[260.0, 0, 160.0], [0, 260.0, 120.0], [0, 0, 1.0]])
    planes = make_room(seed=1)

    # Camera ring through the rendered room.
    imgs, centers = [], []
    for i in range(args.views):
        ang = 0.03 * i
        R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        c = np.array([0.2 * i, 0.0, 0.25 * i])
        imgs.append(render(planes, K, R, -R @ c))
        centers.append(c)
    centers = np.asarray(centers)

    t0 = time.perf_counter()
    # Pipeline detector config (first_octave=0), like the reference SfM
    # FeatureParams — the -1 upsampled octave of the standalone-detector
    # default quadruples frontend cost for little SfM gain.
    from sara_tpu.features.dog import DoGParams
    from sara_tpu.image.pyramid import PyramidParams

    params = SIFTParams(pyramid=PyramidParams(first_octave=0),
                        dog=DoGParams(capacity=1024), total_capacity=4096)
    kps = [compute_sift_keypoints(jnp.asarray(im), params) for im in imgs]
    print(f"SIFT on {args.views} views: "
          f"{[int(k.count()) for k in kps]} keypoints "
          f"({time.perf_counter()-t0:.1f}s incl. compile)")

    t0 = time.perf_counter()
    cfg = GlobalSfMConfig(rel_pose_samples=500, min_pair_inliers=30,
                          pair_chunk=args.pair_chunk)
    out = run_global_sfm(kps, K, config=cfg)
    print(f"global SfM: {out['num_edges']} verified pairs, "
          f"{len(out['points'])} points "
          f"({time.perf_counter()-t0:.1f}s)")

    est_centers = np.stack([-out["R"][v].T @ out["t"][v]
                            for v in range(args.views)])
    print(f"ATE vs ground truth: {ate_rmse(est_centers, centers):.4f}")

    ply = os.path.join(args.out, "cloud.ply")
    write_ply(ply, out["points"])
    print(f"wrote {ply}")


if __name__ == "__main__":
    main()
