"""Probe: steady-state VO frontend cost, per-frame vs batched dispatch.

Renders a short 3-D-room sequence and runs OdometryPipeline.process_frames
(`frontend_batch` frames of undistort+detect+match+E-RANSAC per device
dispatch) against the per-frame path. On the target TPU runtime every
dispatch costs ~27 ms RTT, so the batched program should save ~(B-1) RTTs
per window on top of any vmap efficiency.

Host integration (tracker/PnP/BA) is included — this is the honest
end-to-end VO number, synced by the host fetches integration performs.

Usage: python scripts/bench_vo_frontend.py [--frames 12] [--batch 4] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def make_frames(n):
    from render3d import make_room, render

    K = np.array([[260.0, 0, 160.0], [0, 260.0, 120.0], [0, 0, 1.0]])
    planes = make_room(seed=1)
    imgs, centers = [], []
    for i in range(n):
        ang = 0.02 * i
        R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        c = np.array([0.2 * i, 0.0, 0.25 * i])
        imgs.append(render(planes, K, R, -R @ c))
        centers.append(c)
    return imgs, np.asarray(centers), K


def run(pipe, imgs, batched):
    t0 = time.perf_counter()
    if batched:
        ok = [bool(o) for o in pipe.process_frames(imgs, list(range(len(imgs))))]
    else:
        ok = [bool(pipe.process_frame(im, f)) for f, im in enumerate(imgs)]
    return ok, time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-per-frame", action="store_true")
    ap.add_argument("--ba-every", type=int, default=1,
                    help="BA cadence; large value isolates the frontend "
                    "(per-frame BA dominates the loop otherwise)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from sara_tpu.sfm import OdometryPipeline, OdometryConfig
    from sara_tpu.utils import ate_rmse

    imgs, centers, K = make_frames(args.frames)
    imgs = [jnp.asarray(im) for im in imgs]

    def cfg(b):
        return OdometryConfig(rel_pose_samples=300, pnp_samples=300,
                              rel_pose_min_inliers=40, pnp_min_inliers=15,
                              ba_window=6, frontend_batch=b,
                              ba_every=args.ba_every)

    for label, batched in ([("batched", True)] if args.skip_per_frame
                           else [("batched", True), ("per-frame", False)]):
        pipe = OdometryPipeline(K, cfg(args.batch))
        # Warm pass over the FULL sequence: BA/PnP bucket shapes grow with
        # the graph, so a short warmup still leaves fresh-shape compiles in
        # the measured pass.
        run(pipe, imgs, batched)
        pipe = OdometryPipeline(K, cfg(args.batch))
        ok, dt = run(pipe, imgs, batched)
        acc = sum(ok)
        # Pair accepted poses with the centers of the frames they came from.
        err = ate_rmse(pipe.pose_graph.trajectory(),
                       centers[np.flatnonzero(ok)])
        print(f"{label:10s}: {acc}/{args.frames} accepted, "
              f"{dt / max(acc, 1) * 1e3:.0f} ms/frame, ATE {err:.4f}")


if __name__ == "__main__":
    main()
