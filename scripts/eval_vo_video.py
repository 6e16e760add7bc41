"""VO from an actual video file (the reference's primary demo mode).

Closes the last reference demo mode with no repo equivalent
(reference: cpp/src/DO/Sara/VideoIO/VideoStream.hpp:76,
SfM/Odometry/VideoStreamer.hpp:11-69, and the visual_odometry_example's
video + hardcoded-intrinsics + distortion-corrector loop,
cpp/examples/Sara/MultiViewGeometry/visual_odometry_example.cpp:555-623):

1. render a room-loop sequence THROUGH a Brown-Conrady distorted camera
   (real lens-like k1/k2/p1/p2, rendered by backprojecting distorted
   pixels into rays — not by warping a pinhole render);
2. encode it to an mp4 with ``sara_tpu.io.video.VideoWriter``;
3. stream it back with ``VideoStream(num_skips=...)`` (lossy H.264-class
   pixels, frame skipping) into ``OdometryPipeline`` with precomputed
   Brown-Conrady undistortion maps and the live HTML viewer on;
4. report trajectory ATE vs ground truth of the *streamed* frames.

Usage: python scripts/eval_vo_video.py [--frames 100] [--skip 1] [--cpu]
       [--out eval_vo_video.json]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def render_distorted_loop(planes, camera, n_frames, hw, r_loop=1.6):
    """Render the eval_vo room loop through the distorted camera model."""
    import jax.numpy as jnp

    from render3d import render

    H, W = hw
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    uv = jnp.asarray(np.stack([xs, ys], axis=-1).reshape(-1, 2))
    rays = np.asarray(camera.backproject(uv))  # (H*W, 3), z=1

    K = np.asarray(
        [[float(camera.K.fx), float(camera.K.s), float(camera.K.u0)],
         [0.0, float(camera.K.fy), float(camera.K.v0)], [0, 0, 1.0]])
    imgs, centers, Rgts = [], [], []
    for i in range(n_frames):
        a = 2 * np.pi * i / n_frames
        c = np.array([0.5 + r_loop * np.sin(a), 0.0,
                      4.0 + r_loop * (1 - np.cos(a))])
        yaw = 0.25 * np.sin(a)
        R = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                      [-np.sin(yaw), 0, np.cos(yaw)]])
        imgs.append(render(planes, K, R, -R @ c, hw=hw, rays_cam=rays))
        centers.append(c)
        Rgts.append(R)
    return imgs, np.asarray(centers), Rgts


def write_video(path, imgs, fps=30.0):
    from sara_tpu.io.video import VideoWriter

    h, w = imgs[0].shape
    vw = VideoWriter(path, (h, w), fps=fps)
    for im in imgs:
        u8 = (np.clip(im, 0, 1) * 255).astype(np.uint8)
        vw.write(np.stack([u8] * 3, axis=-1))
    vw.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100,
                    help="frames rendered INTO the video")
    ap.add_argument("--skip", type=int, default=1,
                    help="VideoStream num_skips (reference VideoStreamer)")
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--loop", action="store_true", default=True)
    ap.add_argument("--out", default="eval_vo_video.json")
    ap.add_argument("--video", default="",
                    help="keep the mp4 here (default: temp file)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from eval_real_images import make_real_room
    from sara_tpu.core.cameras import (BrownConrady, Pinhole,
                                       undistortion_maps)
    from sara_tpu.io.video import VideoStream
    from sara_tpu.sfm import OdometryConfig, OdometryPipeline
    from sara_tpu.sfm.loop_closure import LoopCloser, LoopClosureConfig
    from sara_tpu.utils import ate_rmse

    hw = (args.height, args.width)
    f = 0.94 * hw[1]
    pin = Pinhole.from_values(fx=f, fy=f, u0=hw[1] / 2.0, v0=hw[0] / 2.0)
    # Mild barrel + slight tangential — magnitudes of a phone lens
    # (reference hardcodes comparable Brown-Conrady coefficients in its
    # video VO example).
    cam = BrownConrady(K=pin, k=jnp.asarray([-0.22, 0.05, 0.0]),
                       p=jnp.asarray([1e-3, -5e-4]))

    print("rendering distorted room loop...", file=sys.stderr, flush=True)
    imgs, centers, _ = render_distorted_loop(
        make_real_room(), cam, args.frames, hw)

    video_path = args.video or os.path.join(
        tempfile.mkdtemp(prefix="sara_vo_"), "room_loop.mp4")
    write_video(video_path, imgs)
    size_kb = os.path.getsize(video_path) / 1024
    print(f"wrote {video_path} ({size_kb:.0f} kB)", file=sys.stderr)

    K = np.array([[f, 0, hw[1] / 2], [0, f, hw[0] / 2], [0, 0, 1.0]])
    maps = undistortion_maps(cam, *hw)
    cfg = OdometryConfig(rel_pose_samples=300, pnp_samples=300,
                         rel_pose_min_inliers=40, pnp_min_inliers=15,
                         ba_window=8,
                         live_viewer_path=os.path.join(
                             os.path.dirname(video_path), "viewer.html"),
                         live_viewer_every=5)
    pipe = OdometryPipeline(K, cfg, undistortion_maps=maps)
    closer = LoopCloser(K, LoopClosureConfig(
        min_gap=max(args.frames // (2 * (args.skip + 1)), 10),
        min_inliers=40, rel_pose_samples=300))

    vs = VideoStream(video_path, num_skips=args.skip)
    ok, streamed_idx, frame_ms = [], [], []
    t0 = time.perf_counter()
    for frame in vs:
        tf = time.perf_counter()
        accepted = bool(pipe.process_frame(jnp.asarray(frame), vs.frame_index))
        frame_ms.append((time.perf_counter() - tf) * 1e3)
        ok.append(accepted)
        streamed_idx.append(vs.frame_index)
        if accepted:
            closer.add_frame(pipe._prev_keypoints)
        print(f"video frame {vs.frame_index}: "
              f"{'ok' if accepted else 'REJECTED'} "
              f"({pipe.point_cloud.num_points} pts, {frame_ms[-1]:.0f} ms)",
              file=sys.stderr, flush=True)
    elapsed = time.perf_counter() - t0
    vs.close()

    accepted = sum(ok)
    gt_sel = centers[np.asarray(streamed_idx)[np.flatnonzero(ok)]]
    ate_before = float(ate_rmse(pipe.pose_graph.trajectory(), gt_sel))
    closed = bool(closer.close(pipe, accepted - 1))
    ate_after = float(ate_rmse(pipe.pose_graph.trajectory(), gt_sel))

    steady = (float(np.median(frame_ms[10:])) if len(frame_ms) > 20
              else float("nan"))
    artifact = {
        "config": "video-vo-room-loop",
        "backend": jax.default_backend(),
        "video": {"frames_encoded": args.frames, "num_skips": args.skip,
                  "frames_streamed": len(ok), "size_kb": round(size_kb, 1),
                  "codec": "mp4v"},
        "distortion": {"model": "brown_conrady",
                       "k": [-0.22, 0.05, 0.0], "p": [1e-3, -5e-4]},
        "resolution": list(hw),
        "accepted": accepted,
        "fps": round(accepted / elapsed, 3),
        "steady_ms_per_frame": round(steady, 1),
        "ate_before_closure": round(ate_before, 5),
        "loop_closed": closed,
        "ate_after_closure": round(ate_after, 5),
        "map_points": int(pipe.point_cloud.num_points),
    }
    print(json.dumps(artifact))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(artifact, fh, indent=1)
        print(f"artifact written to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
