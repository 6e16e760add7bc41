"""VO evaluation harness (BASELINE configs 2/3): runs the odometry pipeline
on a synthetic N-frame sequence (optionally with loop closure) and reports
ATE + throughput.

--room runs BASELINE config 3 for real: a 100-frame LOOP trajectory
rendered inside the real-photograph-textured room
(scripts/eval_real_images.py scene), full pixels->trajectory VO with BA
cadence on, loop-closure detection + pose-graph correction, and a JSON
artifact with accepted frames / fps / ATE before & after closure.

Usage: python scripts/eval_vo.py [--frames 60] [--loop] [--cpu]
       python scripts/eval_vo.py --room --frames 100 --loop [--cpu]
           [--out eval_vo_room.json]
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


def run_room(args):
    """Config-3 run: rendered real-texture room, circular loop."""
    import jax.numpy as jnp

    from eval_real_images import make_real_room
    from render3d import render
    from sara_tpu.sfm import OdometryConfig, OdometryPipeline
    from sara_tpu.sfm.loop_closure import LoopCloser, LoopClosureConfig
    from sara_tpu.utils import ate_rmse

    import jax

    hw = (args.height, args.width)
    K = np.array([[0.94 * hw[1], 0, hw[1] / 2],
                  [0, 0.94 * hw[1], hw[0] / 2], [0, 0, 1.0]])
    planes = make_real_room()

    # Circular loop inside the room, gently yawing so floor + both walls
    # stay in view; the path returns to its start => a real loop closure.
    imgs, centers, Rgts = [], [], []
    r_loop = 1.6
    for i in range(args.frames):
        a = 2 * np.pi * i / args.frames
        c = np.array([0.5 + r_loop * np.sin(a), 0.0,
                      4.0 + r_loop * (1 - np.cos(a))])
        yaw = 0.25 * np.sin(a)
        R = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                      [-np.sin(yaw), 0, np.cos(yaw)]])
        imgs.append(np.asarray(render(planes, K, R, -R @ c, hw=hw)))
        centers.append(c)
        Rgts.append(R)
    centers = np.asarray(centers)

    cfg = OdometryConfig(rel_pose_samples=300, pnp_samples=300,
                         rel_pose_min_inliers=40, pnp_min_inliers=15,
                         ba_window=8, full_ba_every=args.full_ba_every,
                         ba_every=args.ba_every,
                         frontend_batch=args.frontend_batch)
    pipe = OdometryPipeline(K, cfg)
    closer = (LoopCloser(K, LoopClosureConfig(
        min_gap=max(args.frames // 4, 15), min_inliers=40,
        rel_pose_samples=300, post_ba=args.post_ba))
        if args.loop else None)

    t0 = time.perf_counter()
    ok = []
    frame_ms = []
    if args.pipelined:
        # Lookahead-pipelined loop (process_frames dispatches window k+1
        # while the host integrates window k — VERDICT r3 item 8). Loop
        # closure rides the on_accept hook: retrieval signatures come from
        # a jitted device program per accepted frame (8 KB fetch), so the
        # pipelined path keeps full closure capability (round-5 change;
        # round 4 disabled closure here).
        if closer is not None:
            pipe.on_accept = lambda kp, vid: closer.add_frame(kp)
        warm = min(12, len(imgs) // 4)
        ok += [bool(v) for v in pipe.process_frames(
            [jnp.asarray(im) for im in imgs[:warm]], list(range(warm)))]
        t0 = time.perf_counter()
        ok += [bool(v) for v in pipe.process_frames(
            [jnp.asarray(im) for im in imgs[warm:]],
            list(range(warm, len(imgs))))]
        elapsed = time.perf_counter() - t0
        steady = elapsed / max(len(imgs) - warm, 1) * 1e3
        print(f"pipelined steady: {steady:.0f} ms/frame over "
              f"{len(imgs) - warm} frames", file=sys.stderr, flush=True)
        elapsed = time.perf_counter() - t0
    else:
        for f, im in enumerate(imgs):
            tf = time.perf_counter()
            accepted = bool(pipe.process_frame(jnp.asarray(im), f))
            frame_ms.append((time.perf_counter() - tf) * 1e3)
            ok.append(accepted)
            if accepted and closer is not None:
                closer.add_frame(pipe._prev_keypoints)
            print(f"frame {f}: {'ok' if accepted else 'REJECTED'} "
                  f"({pipe.point_cloud.num_points} pts, "
                  f"{frame_ms[-1]:.0f} ms)", file=sys.stderr, flush=True)
        elapsed = time.perf_counter() - t0
    # Steady state excludes the first frames' compiles.
    if not args.pipelined:
        steady = (np.median(frame_ms[10:]) if len(frame_ms) > 20
                  else float("nan"))
    accepted = sum(ok)
    gt_sel = centers[np.flatnonzero(ok)]
    ate_before = float(ate_rmse(pipe.pose_graph.trajectory(), gt_sel))

    closed = False
    ate_after = ate_before
    if closer is not None:
        closed = bool(closer.close(pipe, accepted - 1))
        ate_after = float(ate_rmse(pipe.pose_graph.trajectory(), gt_sel))
        if os.environ.get("SARA_DUMP_TRAJ"):
            np.savez(os.environ["SARA_DUMP_TRAJ"],
                     traj=pipe.pose_graph.trajectory(), gt=gt_sel,
                     poses=pipe.pose_graph.poses_se3())

    artifact = {
        "config": "baseline-3-room-loop",
        "pipelined": bool(args.pipelined),
        "full_ba_every": args.full_ba_every,
        "backend": jax.default_backend(),
        "frames": args.frames,
        "resolution": list(hw),
        "accepted": accepted,
        "fps": round(accepted / elapsed, 3),
        "ms_per_frame": round(elapsed / max(accepted, 1) * 1e3, 1),
        "steady_ms_per_frame": round(float(steady), 1),
        "steady_fps": round(1e3 / float(steady), 2) if steady == steady
        else None,
        "ate_before_closure": round(ate_before, 5),
        "loop_closed": closed,
        "ate_after_closure": round(ate_after, 5),
        "map_points": int(pipe.point_cloud.num_points),
    }
    print(json.dumps(artifact))
    if args.out:
        existing = []
        if os.path.exists(args.out):
            with open(args.out) as f:
                existing = json.load(f)
                if not isinstance(existing, list):
                    existing = [existing]
        existing.append(artifact)
        with open(args.out, "w") as f:
            json.dump(existing, f, indent=1)
        print(f"artifact appended to {args.out}", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--loop", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--noise", type=float, default=0.3)
    ap.add_argument("--pipelined", action="store_true",
                    help="drive the lookahead-pipelined process_frames "
                    "loop (steady-state A/B; no loop closure)")
    ap.add_argument("--room", action="store_true",
                    help="render the real-texture room loop (config 3)")
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--full-ba-every", type=int, default=8,
                    help="periodic full-trajectory BA cadence (0 = off); "
                    "bounds the monocular bootstrap-draw ATE variance "
                    "(probe_ab_vo.py)")
    ap.add_argument("--ba-every", type=int, default=1,
                    help="windowed-BA cadence (accepted frames per BA)")
    ap.add_argument("--frontend-batch", type=int, default=4,
                    help="frames per fused frontend dispatch (pipelined)")
    ap.add_argument("--post-ba", action="store_true",
                    help="enable the post-closure full-trajectory BA "
                    "(measured harmful on the room loop; "
                    "LoopClosureConfig.post_ba is off by default)")
    ap.add_argument("--out", default="eval_vo_room.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.room:
        run_room(args)
        return

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
