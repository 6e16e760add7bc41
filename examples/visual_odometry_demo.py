"""Monocular visual odometry demo (BASELINE configs 2/3).

Rebuild of the reference VO example
(reference: cpp/examples/Sara/MultiViewGeometry/visual_odometry_example.cpp:
555-623 — video stream, frame skipping, hardcoded intrinsics, OdometryPipeline).

Runs either on a video file (--video) or on a synthetic generated sequence
(--synthetic, default) when no data is available. Outputs trajectory plot +
PLY point cloud.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_video(args):
    import jax.numpy as jnp

    from sara_tpu.io.video import VideoStream
    from sara_tpu.sfm import OdometryPipeline, OdometryConfig

    K = np.array([[args.fx, 0, args.cx], [0, args.fy, args.cy], [0, 0, 1.0]])
    cfg = OdometryConfig()
    if args.live_viewer:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, live_viewer_path=os.path.join(args.out, "viewer.html"),
            live_viewer_every=args.live_viewer)
    pipe = OdometryPipeline(K, cfg)
    vs = VideoStream(args.video, num_skips=args.skip)
    n = 0
    for frame in vs:
        ok = pipe.process_frame(jnp.asarray(frame), vs.frame_index)
        n += 1
        print(f"frame {vs.frame_index}: {'pose added' if ok else 'rejected'}; "
              f"{len(pipe.pose_graph)} poses, "
              f"{pipe.point_cloud.num_points} points")
        if args.max_frames and n >= args.max_frames:
            break
    return pipe


def run_synthetic(args):
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_sfm_pipeline import _make_sequence

    from sara_tpu.sfm import OdometryPipeline, OdometryConfig
    from sara_tpu.utils import ate_rmse

    kps, centers_gt, K = _make_sequence(n_frames=args.max_frames or 20,
                                        noise=0.3)
    pipe = OdometryPipeline(K, OdometryConfig(
        rel_pose_samples=200, pnp_samples=200,
        rel_pose_min_inliers=50, pnp_min_inliers=20,
        live_viewer_path=(os.path.join(args.out, "viewer.html")
                          if args.live_viewer else ""),
        live_viewer_every=args.live_viewer or 5))
    for f, kp in enumerate(kps):
        ok = pipe.process_keypoints(kp, f)
        print(f"frame {f}: {'pose added' if ok else 'rejected'}; "
              f"{pipe.point_cloud.num_points} points")
    err = ate_rmse(pipe.pose_graph.trajectory(), centers_gt)
    print(f"ATE-RMSE vs ground truth: {err:.4f}")
    return pipe, centers_gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--video", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--out", default="/tmp/sara_tpu_vo")
    ap.add_argument("--max-frames", type=int, default=20)
    ap.add_argument("--skip", type=int, default=4)
    ap.add_argument("--fx", type=float, default=800.0)
    ap.add_argument("--fy", type=float, default=800.0)
    ap.add_argument("--cx", type=float, default=640.0)
    ap.add_argument("--cy", type=float, default=360.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--live-viewer", type=int, default=0, metavar="K",
                    help="rewrite <out>/viewer.html every K accepted frames "
                         "(open it in a browser to watch the cloud + "
                         "trajectory grow mid-run); 0 disables")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from sara_tpu.viz import draw_trajectory

    os.makedirs(args.out, exist_ok=True)
    gt = None
    if args.video:
        pipe = run_video(args)
    else:
        pipe, gt = run_synthetic(args)

    draw_trajectory(pipe.pose_graph.trajectory(), gt,
                    os.path.join(args.out, "trajectory.png"))
    pipe.point_cloud.write_ply(os.path.join(args.out, "cloud.ply"))
    print(f"wrote outputs to {args.out}")


if __name__ == "__main__":
    main()
