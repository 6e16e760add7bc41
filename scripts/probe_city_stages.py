"""Stage-isolated diagnosis of the city-scale ATE (config 5).

The 96-view smoke run gives ATE ~1.2 with FULL BA — the error is upstream
of BA. This probe runs the pipeline on the city scene and compares each
stage against ground truth:
  - per-edge relative rotation / translation-direction error,
  - rotation averaging error (after global gauge alignment),
  - translation averaging center error,
  - final ATE.

Usage: python scripts/probe_city_stages.py [views]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_city_scale_scene import make_city_scene, proximity_pairs  # noqa


def main():
    views = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    import jax

    jax.config.update("jax_platforms", "cpu")

    from sara_tpu.ba import BAOptions
    from sara_tpu.sfm.global_sfm import GlobalSfMConfig, run_global_sfm
    from sara_tpu.utils import ate_rmse

    kps, centers_gt, K = make_city_scene(views)
    pairs = proximity_pairs(centers_gt)
    print(f"{views} views, {len(pairs)} pairs", flush=True)

    # Ground-truth poses (must mirror make_city_scene's construction).
    from bench_city_scale_scene import gt_rotations

    R_gt = gt_rotations(views)

    cfg = GlobalSfMConfig(rel_pose_samples=192, min_pair_inliers=20,
                          pair_chunk=32,
                          ba_options=BAOptions(max_iters=20))
    out = run_global_sfm(kps, K, pairs=pairs, config=cfg)

    # --- edge errors vs GT ---
    rot_errs, dir_errs = [], []
    for idx, (a, b) in enumerate(out["edges"]):
        Rr = out["edge_R"][idx]
        tr = out["edge_t"][idx]
        Rr_gt = R_gt[b] @ R_gt[a].T
        e_rot = np.degrees(np.arccos(np.clip(
            (np.trace(Rr_gt.T @ Rr) - 1) / 2, -1, 1)))
        t_gt = R_gt[b] @ (centers_gt[a] - centers_gt[b])
        t_gt = t_gt / max(np.linalg.norm(t_gt), 1e-12)
        tn = tr / max(np.linalg.norm(tr), 1e-12)
        e_dir = np.degrees(np.arccos(np.clip(abs(float(tn @ t_gt)), -1, 1)))
        rot_errs.append(e_rot)
        dir_errs.append(e_dir)
    rot_errs = np.array(rot_errs)
    dir_errs = np.array(dir_errs)
    print(f"edges {len(rot_errs)}/{len(pairs)}: "
          f"rot err med {np.median(rot_errs):.3f} deg "
          f"p90 {np.percentile(rot_errs, 90):.2f}, "
          f"dir err med {np.median(dir_errs):.2f} deg "
          f"p90 {np.percentile(dir_errs, 90):.2f}", flush=True)

    # --- rotation averaging error ---
    R_est = np.asarray(out["R"])
    # Align gauge: G = argmin sum ||R_est - R_gt G^T|| -> polar of sum.
    M = sum(R_est[v].T @ R_gt[v] for v in range(views))
    U, _, Vt = np.linalg.svd(M)
    G = U @ Vt
    rot_glob = [np.degrees(np.arccos(np.clip(
        (np.trace((R_est[v] @ G).T @ R_gt[v]) - 1) / 2, -1, 1)))
        for v in range(views)]
    print(f"global rotations: med {np.median(rot_glob):.3f} deg "
          f"max {np.max(rot_glob):.2f}", flush=True)

    centers = np.stack([-out["R"][v].T @ out["t"][v] for v in range(views)])
    print(f"final ATE {ate_rmse(centers, centers_gt):.4f}", flush=True)
    if "centers_averaged" in out:
        print(f"post-averaging ATE "
              f"{ate_rmse(out['centers_averaged'], centers_gt):.4f}")


if __name__ == "__main__":
    main()
