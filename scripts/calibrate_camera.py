#!/usr/bin/env python
"""Camera calibration CLI — chessboard video/images -> intrinsics JSON.

TPU-native equivalent of the reference calibration tools
(reference: cpp/tools/Calibration/calibrate_pinhole_camera.cpp:193-384 and
calibrate_omnidirectional_cameras.cpp): stream frames, detect ordered
chessboard corners, accumulate views, then solve one joint problem
(Zhang init + LM over intrinsics/distortion/poses; SubsetManifold-style
freezing via --fix-distortion) with RMS-gated acceptance.

Usage:
  python scripts/calibrate_camera.py --images 'frames/*.png' \
      --rows 6 --cols 9 --square-size 0.025 [--model omnidirectional] \
      [--max-views 20] [--rms-max 2.0] -o intrinsics.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def iter_frames(args):
    if args.images:
        for path in sorted(glob.glob(args.images)):
            from sara_tpu.io.image import imread_gray
            yield path, imread_gray(path)
    elif args.video:
        from sara_tpu.io.video import VideoStream
        stream = VideoStream(args.video, num_skips=args.skip)
        for k, frame in enumerate(stream):
            g = frame.mean(axis=-1) if frame.ndim == 3 else frame
            yield f"{args.video}#{k}", np.asarray(g, np.float32) / 255.0
    else:
        raise SystemExit("need --images or --video")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", help="glob of chessboard frames")
    ap.add_argument("--video", help="video file of the chessboard")
    ap.add_argument("--skip", type=int, default=4,
                    help="frames to skip between video samples")
    ap.add_argument("--rows", type=int, required=True,
                    help="inner corner rows")
    ap.add_argument("--cols", type=int, required=True,
                    help="inner corner cols")
    ap.add_argument("--square-size", type=float, default=1.0,
                    help="board square size (meters or arbitrary units)")
    ap.add_argument("--model", choices=["pinhole", "omnidirectional"],
                    default="pinhole")
    ap.add_argument("--max-views", type=int, default=20)
    ap.add_argument("--rms-max", type=float, default=2.0,
                    help="reject calibration if RMS above this (pixels)")
    ap.add_argument("--fix-distortion", action="store_true",
                    help="freeze distortion at zero (pinhole only)")
    ap.add_argument("-o", "--output", default="intrinsics.json")
    args = ap.parse_args(argv)

    from sara_tpu.calib.chessboard import detect_chessboard_corners
    from sara_tpu.calib.calibrate import (calibrate_pinhole,
                                          calibrate_omnidirectional)

    rows, cols = args.rows, args.cols
    model_xy = (np.stack(np.meshgrid(np.arange(cols), np.arange(rows)),
                         axis=-1).reshape(-1, 2).astype(np.float64)
                * args.square_size)

    views = []
    for name, gray in iter_frames(args):
        if len(views) >= args.max_views:
            break
        corners, _ok = detect_chessboard_corners(gray)
        shape = None if corners is None else np.asarray(corners).shape[:2]
        if shape == (cols, rows) and rows != cols:
            # 90 deg-rotated detection of the same physical board: reorder to
            # the (rows, cols) model (square squares -> intrinsics unchanged).
            corners = np.asarray(corners).transpose(1, 0, 2)
            shape = (rows, cols)
        if shape != (rows, cols):
            log(f"[skip] {name}: no ({rows}x{cols}) grid (got {shape})")
            continue
        views.append(np.asarray(corners).reshape(-1, 2))
        log(f"[view {len(views)}] {name}")

    if len(views) < 3:
        raise SystemExit(f"only {len(views)} usable views; need >= 3")

    obj = np.broadcast_to(model_xy, (len(views),) + model_xy.shape).copy()
    img = np.stack(views)
    if args.model == "pinhole":
        result = calibrate_pinhole(obj, img,
                                   fix_distortion=args.fix_distortion)
    else:
        result = calibrate_omnidirectional(obj, img)

    if result["rms"] > args.rms_max:
        log(f"WARNING: RMS {result['rms']:.3f} px exceeds "
            f"--rms-max {args.rms_max}; calibration NOT trustworthy")

    out = {
        "model": args.model,
        "K": np.asarray(result["K"]).tolist(),
        "dist": np.asarray(result["dist"]).tolist(),
        "rms": result["rms"],
        "num_views": len(views),
    }
    if "xi" in result:
        out["xi"] = result["xi"]
    with open(args.output, "w") as f:
        json.dump(out, f, indent=2)
    log(f"wrote {args.output} (rms {result['rms']:.3f} px, "
        f"{len(views)} views)")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
