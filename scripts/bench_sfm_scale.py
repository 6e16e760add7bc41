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


def _make_ring_scene(n_views: int, n_points: int, capacity: int,
                     noise: float = 0.3, seed: int = 1):
    """Cameras on a ring of radius 18 looking at a central point cloud —
    every view sees the cloud, so the scene supports arbitrarily many views
    (the small-sequence test fixture walks away from the cloud and goes
    blind past ~40 frames)."""
    import jax.numpy as jnp

    from sara_tpu.core.types import Keypoints

    rs = np.random.RandomState(seed)
    X = rs.uniform(-5, 5, (n_points, 3))
    desc = rs.normal(size=(n_points, 128))
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    K = np.array([[800.0, 0, 512.0], [0, 800.0, 384.0], [0, 0, 1.0]])

    kps, centers = [], []
    for f in range(n_views):
        ang = 2 * np.pi * f / n_views
        c = np.array([18.0 * np.cos(ang), 2.0 * np.sin(3 * ang),
                      18.0 * np.sin(ang)])
        # Look at the origin: z-axis toward -c.
        z = -c / np.linalg.norm(c)
        up = np.array([0.0, 1.0, 0.0])
        xax = np.cross(up, z)
        xax /= np.linalg.norm(xax)
        yax = np.cross(z, xax)
        R = np.stack([xax, yax, z])         # world -> camera rows
        t = -R @ c
        centers.append(c)
        Xc = X @ R.T + t
        vis = Xc[:, 2] > 1.0
        uv = Xc @ K.T
        uv = uv[:, :2] / uv[:, 2:]
        inside = ((uv[:, 0] >= 0) & (uv[:, 0] < 1024)
                  & (uv[:, 1] >= 0) & (uv[:, 1] < 768))
        # Deterministic (point-id) selection: adjacent views then share most
        # of their kept points — a random subsample per view would leave
        # only ~(cap/N)^2*N common points and starve the matcher.
        idx = np.nonzero(vis & inside)[0][:capacity]
        n = len(idx)
        xy = np.zeros((capacity, 2), np.float32)
        xy[:n] = uv[idx] + rs.normal(scale=noise, size=(n, 2))
        d = np.zeros((capacity, 128), np.float32)
        d[:n] = desc[idx]
        mask = np.zeros(capacity, bool)
        mask[:n] = True
        kps.append(Keypoints(
            xy=jnp.asarray(xy),
            scale=jnp.asarray(np.full(capacity, 2.0, np.float32)),
            orientation=jnp.asarray(np.zeros(capacity, np.float32)),
            response=jnp.asarray(mask.astype(np.float32)),
            descriptors=jnp.asarray(d),
            mask=jnp.asarray(mask),
        ))
    return kps, np.asarray(centers), K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=128)
    ap.add_argument("--points", type=int, default=900,
                    help="cloud size; ~half is visible per ring view, so "
                         "keep below 2x capacity for dense overlap")
    ap.add_argument("--capacity", type=int, default=512)
    ap.add_argument("--window", type=int, default=4,
                    help="pair each view with the next k views")
    ap.add_argument("--chunk", type=int, default=32,
                    help="pairs per device dispatch")
    ap.add_argument("--samples", type=int, default=256,
                    help="RANSAC hypotheses per pair")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ba-iters", type=int, default=40)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from sara_tpu.ba import BAOptions
    from sara_tpu.sfm.global_sfm import GlobalSfMConfig, run_global_sfm
    from sara_tpu.utils import ate_rmse

    log(f"building synthetic collection: {args.views} views, "
        f"{args.points} points, capacity {args.capacity}")
    kps, centers_gt, K = _make_ring_scene(
        n_views=args.views, n_points=args.points, capacity=args.capacity)

    pairs = [(i, j) for i in range(args.views)
             for j in range(i + 1, min(i + 1 + args.window, args.views))]
    log(f"{len(pairs)} pairs, chunk {args.chunk} "
        f"-> {-(-len(pairs) // args.chunk)} dispatches")

    cfg = GlobalSfMConfig(rel_pose_samples=args.samples,
                          min_pair_inliers=20, pair_chunk=args.chunk,
                          ba_options=BAOptions(max_iters=args.ba_iters))

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
    for k, v in out.get("stage_times", {}).items():
        log(f"  stage {k}: {v:.2f}s")
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
