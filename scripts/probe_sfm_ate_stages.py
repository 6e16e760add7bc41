"""Isolate the 512-view global-SfM ATE cliff (VERDICT r2 item 2).

Bypasses the expensive pair stage: generates the ring scene's ground-truth
poses, synthesizes noisy relative-pose edges directly, then runs each
downstream stage (rotation averaging -> translation averaging -> pose-graph
polish) and reports per-stage error at several view counts. The stage whose
error jumps between 128 and 512 views is the bug.

Usage: python scripts/probe_sfm_ate_stages.py [--noise-deg 0.3] [--views 128 256 512]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def ring_poses(n_views):
    Rs, cs = [], []
    for f in range(n_views):
        ang = 2 * np.pi * f / n_views
        c = np.array([18.0 * np.cos(ang), 2.0 * np.sin(3 * ang),
                      18.0 * np.sin(ang)])
        z = -c / np.linalg.norm(c)
        up = np.array([0.0, 1.0, 0.0])
        xax = np.cross(up, z)
        xax /= np.linalg.norm(xax)
        yax = np.cross(z, xax)
        Rs.append(np.stack([xax, yax, z]))
        cs.append(c)
    return np.stack(Rs), np.stack(cs)


def _umeyama(X, Y):
    """Similarity (s, R, t) with Y ~ s * X @ R + t."""
    mx, my = X.mean(0), Y.mean(0)
    Xc, Yc = X - mx, Y - my
    U, S, Vt = np.linalg.svd(Xc.T @ Yc / len(X))
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, 1.0, d])
    R = U @ D @ Vt
    s = (S * np.diag(D)).sum() / (Xc ** 2).mean(0).sum()
    t = my - s * (mx @ R)
    return s, R, t


def rot_noise(rs, deg):
    from sara_tpu.core import lie

    w = rs.normal(scale=np.radians(deg), size=3)
    return np.asarray(lie.so3_exp(jnp.asarray(w)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, nargs="+", default=[128, 256, 512])
    ap.add_argument("--window", type=int, default=3)
    ap.add_argument("--noise-deg", type=float, default=0.3,
                    help="rotation noise per edge (deg); baseline-direction "
                         "noise uses 3x this")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--full", action="store_true",
                    help="continue through triangulation + BA")
    ap.add_argument("--ba-rounds", type=int, default=1)
    ap.add_argument("--ba-iters", type=int, default=40)
    args = ap.parse_args()

    from sara_tpu.core import lie
    from sara_tpu.sfm.global_sfm import _translation_averaging
    from sara_tpu.sfm.rotation_averaging import average_rotations
    from sara_tpu.utils import ate_rmse

    for V in args.views:
        rs = np.random.RandomState(args.seed)
        R_gt, c_gt = ring_poses(V)
        edges = [(i, j) for i in range(V)
                 for j in range(i + 1, min(i + 1 + args.window, V))]
        # Ring closure edges so the graph is a cycle, same as the real run
        # (the window wraps nothing; the real scene's pairs can close via
        # appearance, the synthetic harness adds the closure explicitly).
        edges += [(V - 1 - k, (V - 1 - k + args.window) % V)
                  for k in range(args.window)]
        edges = sorted(set((min(a, b), max(a, b)) for a, b in edges))

        edge_R, edge_t = [], []
        for (a, b) in edges:
            R_rel = R_gt[b] @ R_gt[a].T @ rot_noise(rs, args.noise_deg)
            t_rel = -R_gt[b] @ (c_gt[b] - c_gt[a])
            t_rel = t_rel / np.linalg.norm(t_rel)
            t_rel = rot_noise(rs, 3 * args.noise_deg) @ t_rel
            edge_R.append(R_rel)
            edge_t.append(t_rel)

        ei = jnp.asarray([e[0] for e in edges], jnp.int32)
        ej = jnp.asarray([e[1] for e in edges], jnp.int32)

        # Stage 3: rotation averaging.
        R_abs = np.asarray(average_rotations(
            V, ei, ej, jnp.asarray(np.stack(edge_R))))
        # Align to GT: R_align = argmin sum ||R_abs[v] S - R_gt[v]||.
        M = sum(R_abs[v].T @ R_gt[v] for v in range(V))
        U, _, Vt = np.linalg.svd(M)
        S = U @ np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))]) @ Vt
        rot_err = [np.degrees(np.arccos(np.clip(
            (np.trace(R_gt[v].T @ R_abs[v] @ S) - 1) / 2, -1, 1)))
            for v in range(V)]

        # Stage 4: translation averaging.
        u_dirs = np.stack([-(R_abs[e[1]].T @ t)
                           for e, t in zip(edges, edge_t)])
        centers = _translation_averaging(V, edges, u_dirs, iters=50)
        ate_ta = ate_rmse(centers, c_gt)

        # Stage 4b: pose-graph polish.
        from sara_tpu.sfm.pose_graph_opt import (PoseGraphProblem,
                                                 optimize_pose_graph)

        t_abs = np.stack([-R_abs[v] @ centers[v] for v in range(V)])
        E_n = len(edges)
        poses6 = np.zeros((V, 6))
        for v in range(V):
            poses6[v, :3] = np.asarray(lie.so3_log(jnp.asarray(R_abs[v])))
            poses6[v, 3:] = t_abs[v]
        rel = np.zeros((E_n, 6))
        ok_e = np.zeros(E_n, bool)
        for k, ((a, b), Rr, tu) in enumerate(zip(edges, edge_R, edge_t)):
            s_e = float(np.linalg.norm(centers[b] - centers[a]))
            if s_e < 1e-9:
                continue
            rel[k, :3] = np.asarray(lie.so3_log(jnp.asarray(Rr)))
            rel[k, 3:] = s_e * tu
            ok_e[k] = True
        prob = PoseGraphProblem(
            poses=jnp.asarray(poses6),
            edge_i=ei, edge_j=ej,
            rel_pose=jnp.asarray(rel),
            weight=jnp.ones(E_n),
            edge_mask=jnp.asarray(ok_e),
            pose_fixed=jnp.asarray([True] + [False] * (V - 1)),
        )
        out, info = optimize_pose_graph(prob, max_iters=15)
        p6 = np.asarray(out.poses)
        R_pg = np.stack([np.asarray(lie.so3_exp(jnp.asarray(p6[v, :3])))
                         for v in range(V)])
        c_pg = np.stack([-R_pg[v].T @ p6[v, 3:] for v in range(V)])
        ate_pg = ate_rmse(c_pg, c_gt)

        print(f"V={V:4d} edges={len(edges):5d} "
              f"rot_err mean={np.mean(rot_err):.4f} max={np.max(rot_err):.4f} deg | "
              f"ATE ta={ate_ta:.4f} pg={ate_pg:.4f}", flush=True)

        if not args.full:
            continue

        # --- Stage 5+6: synthetic observations -> triangulation -> BA ---
        # (mirrors run_global_sfm stages with the pair stage bypassed).
        from sara_tpu.ba import BAOptions, BAProblem, bundle_adjust
        from sara_tpu.sfm.global_sfm import _multiview_triangulate

        n_pts = 900
        X_gt = np.random.RandomState(1).uniform(-5, 5, (n_pts, 3))
        K = np.array([[800.0, 0, 512.0], [0, 800.0, 384.0], [0, 0, 1.0]])
        Kinv = np.linalg.inv(K)
        obs_noise = 0.3

        # Visibility: project with GT; keep in-frustum points per view.
        uv_all = np.zeros((V, n_pts, 2))
        vis = np.zeros((V, n_pts), bool)
        for v in range(V):
            t_gt_v = -R_gt[v] @ c_gt[v]
            Xc = X_gt @ R_gt[v].T + t_gt_v
            ok = Xc[:, 2] > 1.0
            uv = Xc @ K.T
            uv = uv[:, :2] / uv[:, 2:]
            ok &= ((uv[:, 0] >= 0) & (uv[:, 0] < 1024)
                   & (uv[:, 1] >= 0) & (uv[:, 1] < 768))
            uv_all[v] = uv + rs.normal(scale=obs_noise, size=(n_pts, 2))
            vis[v] = ok

        # Tracks = points (perfect data association, >= 2 views).
        track_pts = np.nonzero(vis.sum(axis=0) >= 2)[0]
        R_init, c_init = R_pg, c_pg
        t_init = np.stack([-R_init[v] @ c_init[v] for v in range(V)])
        P_all = np.concatenate([R_init, t_init[:, :, None]], axis=2)

        max_len = int(vis[:, track_pts].sum(axis=0).max())
        Tn = len(track_pts)
        P_pad = np.zeros((Tn, max_len, 3, 4))
        uv_pad = np.zeros((Tn, max_len, 2))
        m_pad = np.zeros((Tn, max_len), bool)
        for ti, p in enumerate(track_pts):
            vs = np.nonzero(vis[:, p])[0]
            for k, v in enumerate(vs):
                P_pad[ti, k] = P_all[v]
                xyn = Kinv @ np.array([uv_all[v, p, 0], uv_all[v, p, 1], 1.0])
                uv_pad[ti, k] = xyn[:2] / xyn[2]
                m_pad[ti, k] = True
        X_tri = np.asarray(_multiview_triangulate(
            jnp.asarray(P_pad), jnp.asarray(uv_pad), jnp.asarray(m_pad)))
        good = np.isfinite(X_tri).all(axis=1) & (
            np.linalg.norm(X_tri, axis=1) < 1e3)
        # Report in the GT frame: similarity-align recon centers -> GT and
        # carry the same transform to the points.
        s_al, R_al, t_al = _umeyama(c_init, c_gt)
        X_al = s_al * (X_tri @ R_al) + t_al
        tri_err = np.linalg.norm(X_al[good] - X_gt[track_pts][good], axis=1)
        print(f"      triangulation: {good.sum()}/{Tn} good, "
              f"median err {np.median(tri_err):.4f}", flush=True)

        obs_cam, obs_pt, obs_uv = [], [], []
        kept = {}
        for ti, p in enumerate(track_pts):
            if not good[ti]:
                continue
            kept[ti] = len(kept)
            for v in np.nonzero(vis[:, p])[0]:
                obs_cam.append(v)
                obs_pt.append(kept[ti])
                obs_uv.append(uv_all[v, p])
        poses6 = np.zeros((V, 6))
        for v in range(V):
            poses6[v, :3] = np.asarray(lie.so3_log(jnp.asarray(R_init[v])))
            poses6[v, 3:] = t_init[v]
        intr = np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]])
        for ba_round in range(args.ba_rounds):
            prob_ba = BAProblem(
                poses=jnp.asarray(poses6),
                points=jnp.asarray(X_tri[good][:len(kept)] if ba_round == 0
                                   else X_ba),
                intrinsics=jnp.asarray(intr),
                cam_idx=jnp.asarray(np.asarray(obs_cam, np.int32)),
                pt_idx=jnp.asarray(np.asarray(obs_pt, np.int32)),
                uv=jnp.asarray(np.asarray(obs_uv)),
                obs_mask=jnp.ones(len(obs_cam), bool),
                pose_fixed=jnp.asarray([True] + [False] * (V - 1)),
                point_fixed=jnp.zeros(len(kept), bool),
            )
            out_ba, info = bundle_adjust(
                prob_ba, BAOptions(max_iters=args.ba_iters))
            poses6 = np.asarray(out_ba.poses)
            X_ba = np.asarray(out_ba.points)
            R_ba = np.stack([np.asarray(lie.so3_exp(jnp.asarray(
                poses6[v, :3]))) for v in range(V)])
            c_ba = np.stack([-R_ba[v].T @ poses6[v, 3:] for v in range(V)])
            print(f"      BA round {ba_round}: ATE {ate_rmse(c_ba, c_gt):.5f} "
                  f"(cost {float(np.asarray(info['initial_cost'])):.1f} -> "
                  f"{float(np.asarray(info['final_cost'])):.1f})",
                  flush=True)


if __name__ == "__main__":
    main()
