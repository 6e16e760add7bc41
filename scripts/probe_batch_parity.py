"""Stage-isolated parity probe: vmapped (batched) frontend vs per-frame on
the SAME inputs — the round-5 bisect of the batched-VO TPU accuracy gap
(VERDICT r4 item 1: per-frame ATE 0.030 vs vmapped-batch 0.139 on TPU from
"semantically identical" programs).

Stages probed independently, each batched-vs-single on identical inputs:
  detect : vmap(_compute_sift_jit) vs per-frame _compute_sift_jit
  match  : vmap(match_descriptors) vs per-pair, on IDENTICAL detections
  ransac : vmap(estimate_relative_pose) vs per-pair, identical matches+keys

Prints one JSON line per stage with max deviations, so the diverging stage
is unambiguous. Run on TPU (default) or --cpu for the control.

Usage: python scripts/probe_batch_parity.py [--cpu] [--frames 5]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def kp_set_distance(a, b):
    """Compare two Keypoints: fraction of a's valid kps with a b-kp within
    0.05 px, and the max xy deviation among matched ones; descriptor
    cosine of matched pairs."""
    axy = np.asarray(a.xy)[np.asarray(a.mask)]
    bxy = np.asarray(b.xy)[np.asarray(b.mask)]
    ad = np.asarray(a.descriptors, np.float32)[np.asarray(a.mask)]
    bd = np.asarray(b.descriptors, np.float32)[np.asarray(b.mask)]
    if len(axy) == 0 or len(bxy) == 0:
        return dict(n_a=len(axy), n_b=len(bxy), frac_matched=0.0)
    d2 = ((axy[:, None] - bxy[None]) ** 2).sum(-1)
    j = d2.argmin(1)
    dmin = np.sqrt(d2[np.arange(len(axy)), j])
    matched = dmin < 0.05
    cos = (ad[matched] * bd[j[matched]]).sum(1) / np.maximum(
        np.linalg.norm(ad[matched], axis=1)
        * np.linalg.norm(bd[j[matched]], axis=1), 1e-9)
    return dict(
        n_a=int(len(axy)), n_b=int(len(bxy)),
        frac_matched=round(float(matched.mean()), 4),
        max_xy_dev_matched=round(float(dmin[matched].max()), 5)
        if matched.any() else None,
        min_desc_cos=round(float(cos.min()), 5) if matched.any() else None,
        med_desc_cos=round(float(np.median(cos)), 5) if matched.any() else None,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from eval_real_images import make_real_room
    from render3d import render
    from sara_tpu.features.api import _compute_sift_jit
    from sara_tpu.matching import MatchParams, match_descriptors
    from sara_tpu.ransac import estimate_relative_pose
    from sara_tpu.sfm.odometry import OdometryConfig

    hw = (args.height, args.width)
    K = np.array([[0.94 * hw[1], 0, hw[1] / 2],
                  [0, 0.94 * hw[1], hw[0] / 2], [0, 0, 1.0]])
    planes = make_real_room()
    imgs, Rgt, cgt = [], [], []
    for i in range(args.frames):
        a = 2 * np.pi * i / 100.0
        c = np.array([0.5 + 1.6 * np.sin(a), 0.0, 4.0 + 1.6 * (1 - np.cos(a))])
        yaw = 0.25 * np.sin(a)
        R = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                      [-np.sin(yaw), 0, np.cos(yaw)]])
        imgs.append(np.asarray(render(planes, K, R, -R @ c, hw=hw),
                               np.float32))
        Rgt.append(R)
        cgt.append(c)
    sift = OdometryConfig().sift
    backend = jax.default_backend()
    print(json.dumps({"probe": "setup", "backend": backend,
                      "frames": args.frames}), flush=True)

    # --- Stage 1: detection, single vs vmapped. -------------------------
    single = [_compute_sift_jit(jnp.asarray(im), sift) for im in imgs]
    jax.block_until_ready(single[0].xy)
    batched_all = jax.jit(jax.vmap(
        lambda im: _compute_sift_jit(im, sift)))(jnp.asarray(np.stack(imgs)))
    per_frame = []
    for f in range(args.frames):
        b_f = jax.tree_util.tree_map(lambda x: x[f], batched_all)
        per_frame.append(kp_set_distance(single[f], b_f))
    print(json.dumps({"probe": "detect", "backend": backend,
                      "per_frame": per_frame}), flush=True)

    # --- Stage 2: matching on IDENTICAL (single-path) detections. -------
    mp = MatchParams(ratio=OdometryConfig().match_ratio)
    pair_stats = []
    lefts = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *single[:-1])
    rights = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *single[1:])
    bm = jax.jit(jax.vmap(lambda a, b: match_descriptors(a, b, mp)))(
        lefts, rights)
    for f in range(args.frames - 1):
        sm = match_descriptors(single[f], single[f + 1], mp)
        sj = np.asarray(sm.j)
        sk = np.asarray(sm.mask)
        bj = np.asarray(bm.j[f])
        bk = np.asarray(bm.mask[f])
        pair_stats.append(dict(
            n_single=int(sk.sum()), n_batch=int(bk.sum()),
            mask_diff=int((sk != bk).sum()),
            j_diff_on_common=int((sj[sk & bk] != bj[sk & bk]).sum())))
    print(json.dumps({"probe": "match", "backend": backend,
                      "per_pair": pair_stats}), flush=True)

    # --- Stage 3: E-RANSAC on identical matches + identical keys. -------
    cfg = OdometryConfig()
    Kj = jnp.asarray(K)
    r_stats = []
    keys = jax.random.split(jax.random.PRNGKey(7), args.frames - 1)

    def rp(u, v, mask, key):
        return estimate_relative_pose(
            key, u, v, mask, Kj, Kj,
            threshold_px=cfg.rel_pose_threshold_px,
            num_samples=300, min_inliers=cfg.rel_pose_min_inliers)

    us = jnp.stack([single[f].xy for f in range(args.frames - 1)])
    ms_list = [match_descriptors(single[f], single[f + 1], mp)
               for f in range(args.frames - 1)]
    vs = jnp.stack([single[f + 1].xy[ms_list[f].j]
                    for f in range(args.frames - 1)])
    masks = jnp.stack([ms_list[f].mask for f in range(args.frames - 1)])
    bres, bR, bt = jax.jit(jax.vmap(rp))(us, vs, masks, keys)
    for f in range(args.frames - 1):
        sres, sR, st = rp(us[f], vs[f], masks[f], keys[f])
        # Ground-truth relative rotation / translation direction.
        R_rel_gt = Rgt[f + 1] @ Rgt[f].T
        t_rel_gt = -Rgt[f + 1] @ (cgt[f + 1] - cgt[f])
        t_rel_gt = t_rel_gt / np.linalg.norm(t_rel_gt)

        def ang(Ra):
            c = (np.trace(np.asarray(Ra) @ R_rel_gt.T) - 1) / 2
            return float(np.degrees(np.arccos(np.clip(c, -1, 1))))

        def tang(tv):
            tv = np.asarray(tv).ravel()
            tv = tv / max(np.linalg.norm(tv), 1e-12)
            return float(np.degrees(np.arccos(np.clip(abs(tv @ t_rel_gt),
                                                      -1, 1))))

        r_stats.append(dict(
            single=dict(ok=bool(sres.success),
                        inl=int(np.asarray(sres.num_inliers)),
                        rot_err_deg=round(ang(sR), 4),
                        dir_err_deg=round(tang(st), 4)),
            batch=dict(ok=bool(bres.success[f]),
                       inl=int(np.asarray(bres.num_inliers[f])),
                       rot_err_deg=round(ang(bR[f]), 4),
                       dir_err_deg=round(tang(bt[f]), 4))))
    print(json.dumps({"probe": "ransac", "backend": backend,
                      "per_pair": r_stats}), flush=True)


if __name__ == "__main__":
    main()
