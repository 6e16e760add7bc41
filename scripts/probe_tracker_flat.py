"""Measure compute_tracks cost vs sequence length (VERDICT r3 item 6).

Simulates a VO-like run (capacity features/frame, chained matches) and
times compute_tracks at each frame for (a) the native incremental core and
(b) the NumPy batch path, reporting ms/frame at checkpoints. Done-criterion:
the incremental path is ~flat at 500 frames.

Usage: python scripts/probe_tracker_flat.py [--frames 500] [--cap 4096]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(frames, cap, use_native):
    from sara_tpu.sfm.tracker import FeatureTracker

    rs = np.random.RandomState(0)
    tr = FeatureTracker()
    marks = {}
    checkpoints = sorted({frames // 8, frames // 4, frames // 2,
                          3 * frames // 4, frames - 1})
    t_last = time.perf_counter()
    for f in range(frames):
        tr.add_frame(cap, rs.random(cap).astype(np.float32))
        if f:
            m = cap // 4
            tr.add_matches(f - 1, f, rs.randint(0, cap, m),
                           rs.randint(0, cap, m))
        t0 = time.perf_counter()
        if use_native:
            tr.compute_tracks(2)
        else:
            tr._compute_tracks_batch(2)
        dt = (time.perf_counter() - t0) * 1e3
        if f in checkpoints:
            marks[f] = dt
        t_last = time.perf_counter()
    return marks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--cap", type=int, default=4096)
    ap.add_argument("--batch-frames", type=int, default=200,
                    help="frame budget for the (slow) batch-path comparison")
    args = ap.parse_args()

    inc = run(args.frames, args.cap, use_native=True)
    print("incremental (native core), ms per compute_tracks call:")
    for f, ms in sorted(inc.items()):
        print(f"  frame {f:4d}: {ms:7.1f} ms")
    first, last = min(inc), max(inc)
    growth = inc[last] / max(inc[first], 1e-9)
    print(f"  growth frame {first}->{last}: {growth:.2f}x")

    bat = run(args.batch_frames, args.cap, use_native=False)
    print(f"batch path (to {args.batch_frames} frames), ms per call:")
    for f, ms in sorted(bat.items()):
        print(f"  frame {f:4d}: {ms:7.1f} ms")


if __name__ == "__main__":
    main()
