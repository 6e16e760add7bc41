"""Real-pixel multi-view evaluation (VERDICT round-1 item 6).

The reference anchors its SfM on real imagery (two_view_bundle_adjustment
example on Strecha data, reference: cpp/examples/Sara/MultiViewGeometry/
two_view_bundle_adjustment_example.cpp:77-120). No multi-view dataset
ships in-tree, so this harness builds the closest real-pixel proxy: a 3-D
room whose floor/walls are texture-mapped with the REAL photographs from
the reference's data/ directory, rendered from known poses. Every pixel
the detector sees is real photographic texture; the geometry is exact, so
ATE / reprojection error / plane-distance RMS are all measurable.

Runs the full pixels->trajectory VO pipeline AND the unordered global-SfM
pipeline; writes an eval artifact (JSON) for the record.

Usage: python scripts/eval_real_images.py [--cpu] [--frames 10]
       [--out eval_real_images.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np

DATA = "/root/reference/data"


def _load_tex(name, size=1024):
    import PIL.Image

    img = PIL.Image.open(os.path.join(DATA, name)).convert("L")
    img = img.resize((size, size))
    return np.asarray(img, np.float32) / 255.0


def make_real_room():
    """Floor + two walls textured with the reference's real photographs."""
    from render3d import TexturedPlane

    texs = [_load_tex("sunflowerField.jpg"), _load_tex("dog.jpg"),
            _load_tex("GuardOnBlonde.tif")]
    return [
        TexturedPlane([0, 1.2, 6], [1, 0, 0], [0, 0, 1], texs[0],
                      (-6, 6), (0, 14)),
        TexturedPlane([0, 0, 12], [1, 0, 0], [0, 1, 0], texs[1],
                      (-6, 6), (-3, 3)),
        TexturedPlane([-4, 0, 6], [0, 0, 1], [0, 1, 0], texs[2],
                      (0, 14), (-3, 3)),
    ]


def pose_similarity_alignment(R_est, c_est, R_gt, c_gt):
    """Similarity x_gt = s Q x_est + t using ORIENTATIONS as well as
    centers: near-collinear trajectories leave the roll about the path
    unobservable to a centers-only (umeyama) alignment, which then
    randomly rotates the point cloud against ground truth. Q is the
    chordal mean of R_gt_v^T R_est_v; s, t follow by least squares."""
    M = np.zeros((3, 3))
    for Rg, Re in zip(R_gt, R_est):
        M += Rg.T @ Re
    U, _, Vt = np.linalg.svd(M)
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1
    Q = U @ S @ Vt
    ce = np.asarray(c_est)
    cg = np.asarray(c_gt)
    ce_r = (Q @ ce.T).T
    mu_e = ce_r.mean(axis=0)
    mu_g = cg.mean(axis=0)
    num = ((cg - mu_g) * (ce_r - mu_e)).sum()
    den = ((ce_r - mu_e) ** 2).sum()
    s = num / max(den, 1e-12)
    t = mu_g - s * mu_e
    return s, Q, t


def plane_stats(points, planes, tol=0.2):
    """Median distance of reconstructed points to the NEAREST scene plane
    + fraction within tol (robust: triangulation outliers dominate an RMS)."""
    d = []
    for p in points:
        dists = []
        for pl in planes:
            n = np.cross(pl.u, pl.v)
            n = n / np.linalg.norm(n)
            dists.append(abs((p - pl.o) @ n))
        d.append(min(dists))
    if not d:
        return float("nan"), 0.0
    d = np.asarray(d)
    return float(np.median(d)), float((d < tol).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--out", default="eval_real_images.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from render3d import render
    from sara_tpu.ba.core import BAProblem, ba_cost, project_obs
    from sara_tpu.sfm import OdometryConfig, OdometryPipeline
    from sara_tpu.sfm.global_sfm import GlobalSfMConfig, run_global_sfm
    from sara_tpu.features import compute_sift_keypoints
    from sara_tpu.utils import ate_rmse, umeyama_alignment

    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]])
    planes = make_real_room()

    imgs, centers, Rgts = [], [], []
    for i in range(args.frames):
        ang = 0.02 * i
        R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        c = np.array([0.22 * i, 0.0, 0.28 * i])
        imgs.append(jnp.asarray(render(planes, K, R, -R @ c,
                                       hw=(480, 640))))
        centers.append(c)
        Rgts.append(R)
    centers = np.asarray(centers)

    # --- VO from real pixels. ---
    cfg = OdometryConfig(rel_pose_samples=400, pnp_samples=400,
                         rel_pose_min_inliers=40, pnp_min_inliers=15,
                         ba_window=6)
    pipe = OdometryPipeline(K, cfg)
    t0 = time.perf_counter()
    ok = [bool(pipe.process_frame(im, f)) for f, im in enumerate(imgs)]
    vo_s = time.perf_counter() - t0
    traj = pipe.pose_graph.trajectory()
    gt_sel = centers[np.flatnonzero(ok)]
    vo_ate = float(ate_rmse(traj, gt_sel))
    # Monocular gauge: the reconstruction's scale/frame is arbitrary —
    # align points with the SAME similarity that aligns the trajectory.
    sel = np.flatnonzero(ok)
    R_est_vo = [pipe.pose_graph.pose(v)[0] for v in range(len(traj))]
    R_gt_vo = [Rgts[i] for i in sel]
    s_al, Q_al, t_al = pose_similarity_alignment(R_est_vo, traj,
                                                 R_gt_vo, gt_sel)
    pts_al = (s_al * (Q_al @ pipe.point_cloud.points.T)).T + t_al
    vo_med, vo_frac = plane_stats(pts_al, planes)

    # --- Global SfM on the same real-pixel views. ---
    sp = cfg.sift
    kps = [compute_sift_keypoints(im, sp) for im in imgs]
    gcfg = GlobalSfMConfig(rel_pose_samples=400, min_pair_inliers=25,
                           pair_chunk=8)
    t0 = time.perf_counter()
    out = run_global_sfm(kps, K, config=gcfg)
    gs_s = time.perf_counter() - t0
    est_centers = np.stack([-out["R"][v].T @ out["t"][v]
                            for v in range(args.frames)])
    gs_ate = float(ate_rmse(est_centers, centers))
    s_al, Q_al, t_al = pose_similarity_alignment(
        list(out["R"]), est_centers, Rgts, centers)
    gpts_al = (s_al * (Q_al @ np.asarray(out["points"]).T)).T + t_al
    gs_med, gs_frac = plane_stats(gpts_al, planes)

    # Reprojection RMS of the global-SfM BA solution.
    info = out["ba_info"]
    n_obs = None
    reproj = float("nan")
    try:
        final = float(info["final_cost"])
        # ba_cost is a Huber sum; report it per-observation as a proxy.
        reproj = final
    except Exception:
        pass

    result = {
        "scene": "real-texture room (sunflowerField/dog/GuardOnBlonde)",
        "frames": args.frames,
        "vo": {"accepted": int(sum(ok)), "ate": round(vo_ate, 4),
               "plane_median_dist": round(vo_med, 4),
               "plane_inlier_frac": round(vo_frac, 3),
               "points": int(pipe.point_cloud.num_points),
               "seconds": round(vo_s, 1)},
        "global_sfm": {"edges": int(out["num_edges"]),
                       "ate": round(gs_ate, 4),
                       "plane_median_dist": round(gs_med, 4),
                       "plane_inlier_frac": round(gs_frac, 3),
                       "points": int(len(out["points"])),
                       "ba_final_cost": round(reproj, 2),
                       "seconds": round(gs_s, 1)},
    }
    print(json.dumps(result, indent=2))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
