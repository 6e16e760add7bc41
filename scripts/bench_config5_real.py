#!/usr/bin/env python
"""BASELINE config 5 with the REAL frontend (round-5 artifact).

Renders V >= 128 real-photograph-textured room views and runs the COMPLETE
pipeline with no planted descriptors or ground-truth leakage:

  SIFT detect+describe (production detector, SfM first_octave=0 params)
  -> circular-window pair matching + E-RANSAC relative poses
  -> rotation averaging -> edge-scale translation recovery
  -> triangulation -> keyframe/map-block PARTITIONED BA
     (sara_tpu/ba/partitioned.py) sharded over the virtual 8-device mesh.

Pair selection uses only the loop topology (|i-j| mod V <= window), not the
ground-truth camera centers; every measurement downstream of rendering sees
real pixels only.

Artifact (CONFIG5_r5.json): per-stage wall clock, ATE, and a measured
partitioned-BA scaling table at mesh n = 1/2/4/8 on the SAME packed
problem. Honest caveat recorded in the artifact: this host exposes the
8-device mesh as threads over 2 physical cores, so wall clock past n=2
measures thread contention, not ICI scaling — the n<=2 points are the
hardware-meaningful ones, and the comm-model projection (O(C*6) boundary
exchange per sweep vs observation-proportional block compute) carries the
multi-chip efficiency claim against BASELINE's >=80% bar.

Reference flagship being matched: the full image->reconstruction loop of
/root/reference/cpp/examples/Sara/MultiViewGeometry/
two_view_bundle_adjustment_example.cpp:77-120 at collection scale.

Usage: python scripts/bench_config5_real.py [--views 128]
           [--json CONFIG5_r5.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def render_room_loop(views, hw):
    """Circular loop inside the real-texture room (same scene family as
    eval_vo --room / eval_real_images): floor + two walls textured with the
    reference's photographs, camera orbiting with a gentle yaw so real
    texture stays in view."""
    from eval_real_images import make_real_room
    from render3d import render

    K = np.array([[0.94 * hw[1], 0, hw[1] / 2],
                  [0, 0.94 * hw[1], hw[0] / 2], [0, 0, 1.0]])
    planes = make_real_room()
    imgs, centers, Rgts = [], [], []
    r_loop = 1.6
    for i in range(views):
        a = 2 * np.pi * i / views
        c = np.array([0.5 + r_loop * np.sin(a), 0.0,
                      4.0 + r_loop * (1 - np.cos(a))])
        yaw = 0.25 * np.sin(a)
        R = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                      [-np.sin(yaw), 0, np.cos(yaw)]])
        imgs.append(np.asarray(render(planes, K, R, -R @ c, hw=hw)))
        centers.append(c)
        Rgts.append(R)
    return imgs, np.asarray(centers), np.stack(Rgts), K


def run_config5(views=128, hw=(240, 320), window=3, capacity=1024,
                total_capacity=2048, samples=256, chunk=16, ba_blocks=8,
                ba_sweeps=3, ba_iters=10, mesh_devices=8,
                scaling=(1, 2, 4, 8), log=_log):
    """Full real-frontend config-5 run; returns the artifact dict."""
    import jax
    import jax.numpy as jnp

    from sara_tpu.ba import BAOptions
    from sara_tpu.ba.partitioned import partitioned_bundle_adjust
    from sara_tpu.features import SIFTParams, compute_sift_keypoints
    from sara_tpu.features.api import PyramidParams, DoGParams
    from sara_tpu.parallel import make_mesh
    from sara_tpu.sfm.global_sfm import GlobalSfMConfig, run_global_sfm
    from sara_tpu.utils import ate_rmse

    stage_t = {}
    t0 = time.perf_counter()

    log(f"rendering {views} real-texture views at {hw}")
    imgs, centers_gt, _Rgt, K = render_room_loop(views, hw)
    stage_t["render"] = time.perf_counter() - t0

    # --- REAL frontend: production SIFT on every view (one jitted program,
    # reused across views; SfM-style first_octave=0 like the reference's
    # FeatureParams, SfM/BuildingBlocks/FeatureParams.hpp:10). ---
    sp = SIFTParams(pyramid=PyramidParams(first_octave=0),
                    dog=DoGParams(capacity=capacity, refine_iters=2),
                    total_capacity=total_capacity)
    t0 = time.perf_counter()
    kps = []
    for v, im in enumerate(imgs):
        kp = compute_sift_keypoints(jnp.asarray(im), sp)
        if v == 0:  # force compile before the steady-state loop
            float(np.asarray(kp.xy)[0, 0])
            stage_t["detect_compile"] = time.perf_counter() - t0
            t0 = time.perf_counter()
        kps.append(kp)
    n_kp = float(np.mean([int(np.asarray(k.mask).sum()) for k in kps]))
    stage_t["detect"] = time.perf_counter() - t0
    log(f"detected {n_kp:.0f} kp/view "
        f"({stage_t['detect']:.1f}s steady, "
        f"{stage_t['detect_compile']:.1f}s compile+first)")

    # --- Pairs from loop topology only (no ground-truth leakage). ---
    pairs = sorted({tuple(sorted((i, (i + d) % views)))
                    for i in range(views) for d in range(1, window + 1)})

    mesh = make_mesh(mesh_devices, axis="block") if mesh_devices > 1 else None
    cfg = GlobalSfMConfig(
        rel_pose_samples=samples, min_pair_inliers=20, pair_chunk=chunk,
        ba_options=BAOptions(max_iters=ba_iters),
        ba_blocks=ba_blocks, ba_sweeps=ba_sweeps)

    t0 = time.perf_counter()
    out = run_global_sfm(kps, K, pairs=pairs, config=cfg, ba_mesh=mesh)
    total_sfm = time.perf_counter() - t0
    stage_t.update({f"sfm/{k}": v for k, v in out["stage_times"].items()})

    centers = np.stack([-out["R"][v].T @ out["t"][v] for v in range(views)])
    err = ate_rmse(centers, centers_gt)
    log(f"global SfM {total_sfm:.1f}s, ATE {err:.4f}, "
        f"edges {out['num_edges']}/{len(pairs)}, points {len(out['points'])}")

    # --- Measured partitioned-BA scaling on the SAME packed problem. ---
    prob = out["ba_problem"]
    opts = BAOptions(max_iters=ba_iters)
    scaling_rows = []
    base = None
    for n in scaling:
        if n > jax.device_count():
            break
        m = make_mesh(n, axis="block") if n > 1 else None
        res, info = partitioned_bundle_adjust(
            prob, ba_blocks, opts, sweeps=ba_sweeps, mesh=m)
        float(info["final_cost"])  # compile + warm
        t0 = time.perf_counter()
        res, info = partitioned_bundle_adjust(
            prob, ba_blocks, opts, sweeps=ba_sweeps, mesh=m)
        final_cost = float(info["final_cost"])
        dt = time.perf_counter() - t0
        base = base or dt
        scaling_rows.append({
            "mesh_devices": n, "wall_s": round(dt, 3),
            "speedup": round(base / dt, 3),
            "efficiency": round(base / dt / n, 3),
            "final_cost": round(final_cost, 2)})
        log(f"  partitioned-BA mesh n={n}: {dt*1e3:.0f} ms "
            f"speedup {base/dt:.2f}x eff {base/dt/n*100:.0f}%")

    # --- Comm-model projection to real (2 hosts x 4 chips) hardware. ---
    from sara_tpu.parallel.comm_model import DCN_BW, PEAK_F32_FLOPS

    n_obs = out.get("n_obs", 0)
    per_block_flops = (n_obs / max(ba_blocks, 1)) * 1200.0 * ba_iters
    exchange_bytes = views * 6 * 4 + len(out.get("points", [])) * 3 * 4
    t_comp = per_block_flops / (PEAK_F32_FLOPS * 0.02)  # 2% roofline (meas.)
    t_comm = exchange_bytes / DCN_BW
    proj_eff = t_comp / (t_comp + t_comm)
    log(f"  2x4 projection: block compute {t_comp*1e3:.2f} ms + boundary "
        f"exchange {t_comm*1e3:.2f} ms -> {proj_eff*100:.1f}% efficiency")

    import multiprocessing

    artifact = {
        "config": 5,
        "frontend": "real (production SIFT on rendered real-photo texture)",
        "views": views,
        "resolution": list(hw),
        "kp_per_view": round(n_kp, 1),
        "pairs": len(pairs),
        "edges": int(out["num_edges"]),
        "points": int(len(out["points"])),
        "observations": int(out.get("n_obs", 0)),
        "ate": round(float(err), 4),
        "total_sfm_s": round(total_sfm, 1),
        "stage_times_s": {k: round(v, 2) for k, v in stage_t.items()},
        "ba_blocks": ba_blocks,
        "ba_sweeps": ba_sweeps,
        "mesh_devices": mesh_devices,
        "partitioned_ba_scaling": scaling_rows,
        "host_physical_cores": multiprocessing.cpu_count(),
        "scaling_caveat": (
            "virtual mesh devices time-share the host's physical cores; "
            "wall clock past n=cores measures thread contention, not ICI. "
            "The comm structure is hardware-faithful (zero cross-block "
            "traffic within a sweep, O(C*6) boundary exchange between)"),
        "projected_2x4_efficiency": round(proj_eff, 3),
    }
    return artifact


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=128)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--window", type=int, default=3)
    ap.add_argument("--capacity", type=int, default=1024)
    ap.add_argument("--total-capacity", type=int, default=2048)
    ap.add_argument("--samples", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--ba-blocks", type=int, default=8)
    ap.add_argument("--ba-sweeps", type=int, default=3)
    ap.add_argument("--ba-iters", type=int, default=10)
    ap.add_argument("--mesh", type=int, default=8)
    ap.add_argument("--json", default="CONFIG5_r5.json")
    args = ap.parse_args()

    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")

    artifact = run_config5(
        views=args.views, hw=(args.height, args.width), window=args.window,
        capacity=args.capacity, total_capacity=args.total_capacity,
        samples=args.samples, chunk=args.chunk, ba_blocks=args.ba_blocks,
        ba_sweeps=args.ba_sweeps, ba_iters=args.ba_iters,
        mesh_devices=args.mesh)
    with open(args.json, "w") as f:
        json.dump(artifact, f, indent=1)
    _log(f"wrote {args.json}")
    print(json.dumps({"metric": "config5_real_ate", "value": artifact["ate"],
                      "unit": "ATE", "views": artifact["views"],
                      "total_sfm_s": artifact["total_sfm_s"]}))


if __name__ == "__main__":
    main()
