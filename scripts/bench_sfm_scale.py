#!/usr/bin/env python
"""Unordered-SfM scale benchmark (BASELINE config 4 scaffolding).

Synthetic V-view collection (cameras orbiting a point cloud, capacity-N
keypoints with planted descriptors) -> full global SfM: batched pair
matching + E-RANSAC (chunks of pairs per device program), rotation/
translation averaging, multiview triangulation, Schur-complement BA.
Reports per-stage wall clock, pair throughput, and ATE vs ground truth.

The reference runs this class of workload one pair at a time on CPU
threads (SURVEY.md 2.5); the batched pair stage is the TPU-native scaling
path (pair_chunk pairs per ~27 ms dispatch).

Usage: python scripts/bench_sfm_scale.py [--views 128] [--chunk 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=128)
    ap.add_argument("--points", type=int, default=4000)
    ap.add_argument("--capacity", type=int, default=256)
    ap.add_argument("--window", type=int, default=4,
                    help="pair each view with the next k views")
    ap.add_argument("--chunk", type=int, default=32,
                    help="pairs per device dispatch")
    ap.add_argument("--samples", type=int, default=256,
                    help="RANSAC hypotheses per pair")
    args = ap.parse_args()

    from test_sfm_pipeline import _make_sequence
    from sara_tpu.ba import BAOptions
    from sara_tpu.sfm.global_sfm import GlobalSfMConfig, run_global_sfm
    from sara_tpu.utils import ate_rmse

    log(f"building synthetic collection: {args.views} views, "
        f"{args.points} points, capacity {args.capacity}")
    kps, centers_gt, K = _make_sequence(
        n_frames=args.views, n_points=args.points, noise=0.3, seed=1,
        capacity=args.capacity)

    pairs = [(i, j) for i in range(args.views)
             for j in range(i + 1, min(i + 1 + args.window, args.views))]
    log(f"{len(pairs)} pairs, chunk {args.chunk} "
        f"-> {-(-len(pairs) // args.chunk)} dispatches")

    cfg = GlobalSfMConfig(rel_pose_samples=args.samples,
                          min_pair_inliers=20, pair_chunk=args.chunk,
                          ba_options=BAOptions(max_iters=20))

    t0 = time.perf_counter()
    out = run_global_sfm(kps, K, pairs=pairs, config=cfg)
    total = time.perf_counter() - t0

    centers = np.stack([-out["R"][v].T @ out["t"][v]
                        for v in range(args.views)])
    err = ate_rmse(centers, centers_gt)
    pair_rate = len(pairs) / total

    log(f"total {total:.1f}s ({pair_rate:.1f} pairs/s incl. averaging/BA), "
        f"edges {out['num_edges']}, points {len(out['points'])}, "
        f"ATE {err:.4f}")
    print(json.dumps({
        "metric": "global_sfm_views_per_s",
        "value": round(args.views / total, 3),
        "unit": "views/s",
        "views": args.views,
        "pairs": len(pairs),
        "ate": round(float(err), 4),
        "total_s": round(total, 1),
    }))


if __name__ == "__main__":
    main()
