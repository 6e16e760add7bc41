"""Seeded A/B of per-frame vs batched/pipelined VO on the room loop.

Round-5 follow-up to probe_batch_parity.py, which showed the vmapped
detection/matching/E-RANSAC programs are numerically IDENTICAL to the
per-frame ones on TPU. The remaining suspects for the round-4 "batched
accuracy gap" (ATE 0.030 vs 0.139) are (a) RANSAC-draw variance — the two
modes consume different PRNG streams, and the FIRST relative pose sets the
scale of the whole monocular map — and (b) driver logic in process_frames.
This probe runs BOTH modes over SEVERAL seeds in one process and prints
the ATE distribution: overlapping distributions = variance, a systematic
offset = driver bug.

Usage: python scripts/probe_ab_vo.py [--cpu] [--frames 40] [--seeds 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--seed0", type=int, default=0)
    ap.add_argument("--modes", default="per_frame,batched",
                    help="comma list of: per_frame, batched, batched_B1, "
                    "per_frame_full, warm_then_batched")
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from eval_real_images import make_real_room
    from render3d import render
    from sara_tpu.sfm import OdometryConfig, OdometryPipeline
    from sara_tpu.utils import ate_rmse

    hw = (args.height, args.width)
    K = np.array([[0.94 * hw[1], 0, hw[1] / 2],
                  [0, 0.94 * hw[1], hw[0] / 2], [0, 0, 1.0]])
    planes = make_real_room()
    imgs, centers = [], []
    for i in range(args.frames):
        a = 2 * np.pi * i / 100.0
        c = np.array([0.5 + 1.6 * np.sin(a), 0.0, 4.0 + 1.6 * (1 - np.cos(a))])
        yaw = 0.25 * np.sin(a)
        R = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                      [-np.sin(yaw), 0, np.cos(yaw)]])
        imgs.append(np.asarray(render(planes, K, R, -R @ c, hw=hw),
                               np.float32))
        centers.append(c)
    centers = np.asarray(centers)
    jimgs = [jnp.asarray(im) for im in imgs]

    cfg = OdometryConfig(rel_pose_samples=300, pnp_samples=300,
                         rel_pose_min_inliers=40, pnp_min_inliers=15,
                         ba_window=8)

    import dataclasses

    mode_list = args.modes.split(",")
    results = {m: [] for m in mode_list}
    for seed in range(args.seed0, args.seed0 + args.seeds):
        for mode in mode_list:
            mcfg = cfg
            if mode == "batched_B1":
                mcfg = dataclasses.replace(cfg, frontend_batch=1)
            elif mode == "per_frame_full":
                mcfg = dataclasses.replace(cfg, rel_pose_samples_fast=0)
            elif mode in ("batched_fullba", "per_frame_fullba"):
                mcfg = dataclasses.replace(cfg, full_ba_every=8)
            pipe = OdometryPipeline(K, mcfg)
            pipe._key = jax.random.PRNGKey(1000 + seed)
            t0 = time.perf_counter()
            if mode in ("per_frame", "per_frame_full", "per_frame_fullba"):
                ok = [bool(pipe.process_frame(jimgs[f], f))
                      for f in range(args.frames)]
            elif mode == "warm_then_batched":
                warm = 5
                ok = [bool(pipe.process_frame(jimgs[f], f))
                      for f in range(warm)]
                ok += [bool(v) for v in pipe.process_frames(
                    jimgs[warm:], list(range(warm, args.frames)))]
            else:
                ok = [bool(v) for v in
                      pipe.process_frames(jimgs, list(range(args.frames)))]
            wall = time.perf_counter() - t0
            gt = centers[np.flatnonzero(ok)]
            ate = float(ate_rmse(pipe.pose_graph.trajectory(), gt))
            results[mode].append(
                dict(seed=seed, ate=round(ate, 4), accepted=sum(ok),
                     ms_per_frame=round(wall / args.frames * 1e3, 1)))
            print(json.dumps({"mode": mode, **results[mode][-1],
                              "backend": jax.default_backend()}),
                  flush=True)

    for mode, rows in results.items():
        ates = [r["ate"] for r in rows]
        print(json.dumps({"summary": mode,
                          "ate_min": min(ates), "ate_med": sorted(ates)[len(ates)//2],
                          "ate_max": max(ates)}), flush=True)


if __name__ == "__main__":
    main()
