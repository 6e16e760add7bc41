"""VO evaluation harness (BASELINE configs 2/3): runs the odometry pipeline
on a synthetic N-frame sequence (optionally with loop closure) and reports
ATE + throughput.

Usage: python scripts/eval_vo.py [--frames 60] [--loop] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--loop", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--noise", type=float, default=0.3)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from sara_tpu.sfm import OdometryPipeline, OdometryConfig
    from sara_tpu.sfm.loop_closure import LoopCloser, LoopClosureConfig
    from sara_tpu.utils import ate_rmse

    if args.loop:
        from test_loop_closure import _make_loop_sequence

        kps, centers_gt, K = _make_loop_sequence(
            n_frames=args.frames, noise=args.noise)
    else:
        from test_sfm_pipeline import _make_sequence

        kps, centers_gt, K = _make_sequence(
            n_frames=args.frames, n_points=800, noise=args.noise)

    cfg = OdometryConfig(rel_pose_samples=300, pnp_samples=300,
                         rel_pose_min_inliers=40, pnp_min_inliers=20,
                         ba_window=8)
    pipe = OdometryPipeline(K, cfg)
    closer = LoopCloser(K, LoopClosureConfig(min_gap=15, min_inliers=40,
                                             rel_pose_samples=300)) \
        if args.loop else None

    t0 = time.perf_counter()
    ok = []
    for f, kp in enumerate(kps):
        ok.append(bool(pipe.process_keypoints(kp, f)))
        if ok[-1] and closer is not None:
            closer.add_frame(kp)
    elapsed = time.perf_counter() - t0
    accepted = sum(ok)
    traj = pipe.pose_graph.trajectory()
    # Pair each accepted pose with the ground truth of its own frame.
    gt_sel = centers_gt[np.flatnonzero(ok)]
    err = ate_rmse(traj, gt_sel)
    print(f"frames accepted: {accepted}/{args.frames}")
    print(f"throughput: {accepted/elapsed:.2f} frames/s "
          f"({elapsed/max(accepted,1)*1e3:.0f} ms/frame incl. host)")
    print(f"ATE-RMSE before loop closure: {err:.4f}")
    print(f"map points: {pipe.point_cloud.num_points}")

    if closer is not None:
        closed = closer.close(pipe, accepted - 1)
        err2 = ate_rmse(pipe.pose_graph.trajectory(), gt_sel)
        print(f"loop closed: {closed}; ATE after: {err2:.4f}")


if __name__ == "__main__":
    main()
