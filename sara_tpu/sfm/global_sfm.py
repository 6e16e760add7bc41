"""Global (unordered) SfM: match pairs -> averaging -> triangulate -> BA.

A capability the reference only reaches incrementally (its OdometryPipeline
processes video frame by frame); for unordered collections (BASELINE
configs 4/5) the global pipeline is the scalable TPU-native design:

  1. pairwise matching (one jitted GEMM program, batched over pairs),
  2. per-pair essential RANSAC (one jitted program, reused across pairs),
  3. spectral rotation averaging over the epipolar graph
     (sara_tpu.sfm.rotation_averaging),
  4. translation averaging: alternating least squares on camera centers
     from pairwise baseline directions (c_j - c_i = s_ij * u_ij,
     u_ij = -R_j^T t_ij, s_ij >= smin as the scale gauge),
  5. track building (native union-find) + batched multi-view DLT
     triangulation,
  6. global Schur-complement bundle adjustment (sara_tpu.ba), optionally
     sharded over a device mesh (sara_tpu.parallel).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from sara_tpu.ba import BAOptions, BAProblem, bundle_adjust
from sara_tpu.core import lie
from sara_tpu.core.types import Keypoints
from sara_tpu.matching import MatchParams, match_descriptors
from sara_tpu.ransac import estimate_relative_pose
from sara_tpu.sfm.rotation_averaging import average_rotations
from sara_tpu.sfm.tracker import FeatureTracker


@dataclass(frozen=True)
class GlobalSfMConfig:
    match_ratio: float = 0.8
    rel_pose_samples: int = 500
    rel_pose_threshold_px: float = 4.0
    min_pair_inliers: int = 30
    # IRLS rounds of the projected translation-averaging solve; each round
    # is an exact dense (3n)x(3n) solve given the weights, so ~6 suffices.
    # Cost/memory scale O((3n)^2) per round — fine to ~1k views; beyond
    # that prefer the sparse CG path in sfm/edge_scales.py-style solvers.
    translation_iters: int = 6
    # LM pose-graph refinement over the epipolar graph between averaging
    # and triangulation (edge translations re-scaled by the averaged
    # baselines): polishes the averaging initialization jointly before
    # points exist. 0 disables.
    pose_graph_iters: int = 15
    min_track_length: int = 2
    ba_options: BAOptions = field(default_factory=lambda: BAOptions(max_iters=30))
    # Pairs per device dispatch for the match+relative-pose stage. 0 keeps
    # the one-program-per-pair path; > 0 runs chunks of pairs as ONE vmapped
    # program — the scaling path for large unordered collections (a 500-image
    # set has 10^4-10^5 candidate pairs; at ~27 ms dispatch RTT per program
    # the per-pair path would spend hours on round-trips alone).
    pair_chunk: int = 0
    # Keyframe/map-block partitioned BA (BASELINE config 5): > 0 splits the
    # final bundle adjustment into this many camera blocks solved as
    # vmapped dense-Schur sub-problems (ba/partitioned.py), optionally
    # sharded over a device mesh (``ba_mesh``). 0 = single global solve.
    ba_blocks: int = 0
    ba_sweeps: int = 3
    # Use shared-track depth-ratio edge scales for translation recovery
    # (sfm/edge_scales.py); falls back to direction-only averaging when
    # fewer than half the edges receive a scale constraint.
    edge_scale_translation: bool = True


@functools.partial(jax.jit, static_argnames=(
    "ratio", "threshold_px", "num_samples", "min_inliers"))
def _pair_chunk_program(xy, desc, mask, ia, ib, keys, K,
                        ratio, threshold_px, num_samples, min_inliers):
    """Match + E-RANSAC for a chunk of image pairs as one program.

    xy/desc/mask: (V, N, ...) stacked keypoint arrays; ia/ib: (B,) pair
    indices. Returns per-pair (j, ok, inliers, success, R, t).
    """
    from sara_tpu.core.types import Keypoints, Matches

    def one(a, b, key):
        ka = Keypoints(xy[a], jnp.zeros(xy.shape[1]), jnp.zeros(xy.shape[1]),
                       jnp.zeros(xy.shape[1]), desc[a], mask[a])
        kb = Keypoints(xy[b], jnp.zeros(xy.shape[1]), jnp.zeros(xy.shape[1]),
                       jnp.zeros(xy.shape[1]), desc[b], mask[b])
        m = match_descriptors(ka, kb, MatchParams(ratio=ratio))
        res, R, t = estimate_relative_pose(
            key, xy[a], xy[b][m.j], m.mask, K, K,
            threshold_px=threshold_px, num_samples=num_samples,
            min_inliers=min_inliers)
        return m.j, m.mask, res.inliers & m.mask, res.success, R, t

    return jax.vmap(one)(ia, ib, keys)


@functools.partial(jax.jit, static_argnames=("n", "iters"))
def _translation_averaging_jit(ei: jnp.ndarray, ej: jnp.ndarray,
                               u_dirs: jnp.ndarray, n: int, iters: int,
                               s_min: float = 1.0,
                               huber: float = 0.5) -> jnp.ndarray:
    """Camera centers from pairwise unit baseline directions — ONE device
    program, EXACT inner solve.

    Joint (c, s) least squares: minimize sum_e w_e ||c_j - c_i - s_e u_e||^2
    subject to c_0 = 0 (translation gauge) and the FIXED scale gauge
    sum_e s_e = E. Eliminating each s_e in closed form under the gauge
    (s_e = u_e . d_e - lam / w_e, lam = (sum u . d - E) / sum 1/w) reduces
    the problem to an UNCONSTRAINED quadratic in c alone:

        sum_e w_e ||P_e (c_j - c_i)||^2
            + (sum_e u_e . (c_j - c_i) - E)^2 / sum_e w_e^-1,

    with P_e = I - u u^T — the Govindu projected Laplacian PLUS a rank-one
    total-length term that pins the scale (the projected form alone has the
    classic clustering collapse; the round-3 block-coordinate scheme was
    collapse-free but STALLS far from the optimum on chain-like graphs:
    measured ATE 0.40 at 50 iters / 0.34 at 400 on EXACT directions of a
    96-view boustrophedon sweep, vs ~1e-6 for this direct solve). One
    (3n)x(3n) dense solve per IRLS round; ``iters`` counts Huber
    reweighting rounds (a handful suffices).
    """
    E = ei.shape[0]
    dt = u_dirs.dtype
    eye3 = jnp.eye(3, dtype=dt)
    P = eye3[None] - u_dirs[:, :, None] * u_dirs[:, None, :]   # (E, 3, 3)

    def solve(w):
        wP = w[:, None, None] * P
        L = (jnp.zeros((n, 3, n, 3), dt)
             .at[ei, :, ei, :].add(wP).at[ej, :, ej, :].add(wP)
             .at[ei, :, ej, :].add(-wP).at[ej, :, ei, :].add(-wP))
        # Rank-one scale term: g = incidence-assembled directions.
        g = (jnp.zeros((n, 3), dt).at[ei].add(-u_dirs).at[ej].add(u_dirs))
        sw = jnp.sum(1.0 / jnp.maximum(w, 1e-9))
        Lf = (L.reshape(3 * n, 3 * n)
              + g.reshape(-1)[:, None] * g.reshape(-1)[None, :] / sw)
        rhs = (E / sw) * g.reshape(-1)
        # Gauge c_0 = 0: zero out the first block row/col, identity there.
        mask = jnp.concatenate([jnp.zeros(3, dt), jnp.ones(3 * (n - 1), dt)])
        Lf = (Lf * mask[:, None] * mask[None, :]
              + jnp.diag(1.0 - mask))
        rhs = rhs * mask
        c = jnp.linalg.solve(
            Lf + 1e-8 * jnp.eye(3 * n, dtype=dt), rhs)
        return c.reshape(n, 3)

    def body(_, state):
        c, w = state
        d = c[ej] - c[ei]
        p = jnp.einsum("ed,ed->e", d, u_dirs)
        lam = (jnp.sum(p) - E) / jnp.sum(1.0 / jnp.maximum(w, 1e-9))
        s = p - lam / jnp.maximum(w, 1e-9)
        rn = jnp.linalg.norm(d - s[:, None] * u_dirs, axis=1)
        w = jnp.minimum(1.0, huber / jnp.maximum(rn, 1e-9))
        return solve(w), w

    c0 = solve(jnp.ones((E,), dt))
    c, _ = jax.lax.fori_loop(0, iters, body, (c0, jnp.ones((E,), dt)))
    # Metric gauge for callers: median baseline length = s_min.
    base = jnp.linalg.norm(c[ej] - c[ei], axis=1)
    med = jnp.median(base)
    return c * (s_min / jnp.maximum(med, 1e-12))


def _translation_averaging(n: int, edges: Sequence[Tuple[int, int]],
                           u_dirs: np.ndarray, iters: int = 50,
                           s_min: float = 1.0) -> np.ndarray:
    """Host wrapper over the jitted alternating solve."""
    ei = jnp.asarray([e[0] for e in edges], jnp.int32)
    ej = jnp.asarray([e[1] for e in edges], jnp.int32)
    return np.asarray(_translation_averaging_jit(
        ei, ej, jnp.asarray(u_dirs), n, iters, s_min))


def _multiview_triangulate(P_mats: jnp.ndarray, uv: jnp.ndarray,
                           mask: jnp.ndarray) -> jnp.ndarray:
    """Batched multi-view DLT.

    P_mats: (T, V, 3, 4) per-track camera matrices (padded), uv: (T, V, 2)
    pixels, mask: (T, V). Returns (T, 3) points (masked rows contribute
    zero equations)."""

    def one(P, x, m):
        r1 = x[:, 0, None] * P[:, 2] - P[:, 0]      # (V, 4)
        r2 = x[:, 1, None] * P[:, 2] - P[:, 1]
        A = jnp.concatenate([r1, r2], axis=0)       # (2V, 4)
        # Row normalization: the DLT is f32-fragile without it when the
        # camera matrices carry pixel-scale entries (measured: point
        # clouds 20x worse in f32 than f64 before this; callers should
        # ALSO pass K-normalized cameras/coords — see run_global_sfm).
        A = A / jnp.maximum(
            jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
        w = jnp.concatenate([m, m], axis=0).astype(A.dtype)
        A = A * w[:, None]
        _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
        X = Vt[-1]
        return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])

    return jax.vmap(one)(P_mats, uv, mask)


def run_global_sfm(keypoint_sets: List[Keypoints], K: np.ndarray,
                   pairs: Optional[List[Tuple[int, int]]] = None,
                   config: GlobalSfMConfig = GlobalSfMConfig(),
                   key=None, ba_mesh=None):
    """Reconstruct an unordered image collection.

    Args:
      keypoint_sets: per-image fixed-capacity Keypoints (same capacity).
      K: shared (3, 3) intrinsics.
      pairs: image pairs to match (default: all pairs).

    Returns dict with R (V,3,3), t (V,3), points (P,3), tracker, ba_info.
    """
    import time as _time

    V = len(keypoint_sets)
    if key is None:
        key = jax.random.PRNGKey(0)
    if pairs is None:
        pairs = [(i, j) for i in range(V) for j in range(i + 1, V)]
    Kj = jnp.asarray(K)
    stage_t = {}
    _t0 = _time.perf_counter()

    def _mark(name):
        nonlocal _t0
        now = _time.perf_counter()
        stage_t[name] = now - _t0
        _t0 = now

    # --- Stage 1+2: matching + relative poses over the pair list. ---
    tracker = FeatureTracker()
    for v in range(V):
        kp = keypoint_sets[v]
        tracker.add_frame(kp.capacity, np.asarray(kp.response))

    edges = []
    edge_R = []
    edge_t = []
    edge_feats = []
    if config.pair_chunk > 0:
        # Batched pair stage: chunks of pairs as one vmapped program each.
        # The view axis is padded to a power-of-two bucket so the compiled
        # program is reused as the collection grows (compile time on the
        # target runtime is ~10 s per fresh shape; an incremental driver
        # adding views one by one would otherwise recompile every frame).
        # Padded views are all-masked-out and never indexed by real pairs.
        B = config.pair_chunk
        Vb = max(8, 1 << (V - 1).bit_length())
        pad_v = Vb - V

        def stack_pad(arrs):
            s = jnp.stack(arrs)
            if pad_v:
                s = jnp.concatenate(
                    [s, jnp.zeros((pad_v,) + s.shape[1:], s.dtype)])
            return s

        xy = stack_pad([k.xy for k in keypoint_sets])
        desc = stack_pad([k.descriptors for k in keypoint_sets])
        msk = stack_pad([k.mask for k in keypoint_sets])
        N = xy.shape[1]
        arange = np.arange(N)
        n_chunks = -(-len(pairs) // B)
        for ci, c0 in enumerate(range(0, len(pairs), B)):
            if ci % 20 == 0:
                import sys as _sys

                print(f"  pair stage: chunk {ci}/{n_chunks}",
                      file=_sys.stderr, flush=True)
            chunk = pairs[c0:c0 + B]
            pad = B - len(chunk)
            ia = jnp.asarray([p[0] for p in chunk] + [0] * pad, jnp.int32)
            ib = jnp.asarray([p[1] for p in chunk] + [0] * pad, jnp.int32)
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, B)
            j, ok, inl, success, R, t = _pair_chunk_program(
                xy, desc, msk, ia, ib, keys, Kj,
                config.match_ratio, config.rel_pose_threshold_px,
                config.rel_pose_samples, config.min_pair_inliers)
            j, inl, success, R, t = map(np.asarray, (j, inl, success, R, t))
            for bi, (a, b) in enumerate(chunk):
                if not success[bi]:
                    continue
                edges.append((a, b))
                edge_R.append(R[bi])
                edge_t.append(t[bi] / max(np.linalg.norm(t[bi]), 1e-12))
                sel = inl[bi]
                edge_feats.append((arange[sel].copy(), j[bi][sel].copy()))
                tracker.add_matches(a, b, arange[sel], j[bi][sel])
    else:
        mp = MatchParams(ratio=config.match_ratio)
        for (a, b) in pairs:
            ka, kb = keypoint_sets[a], keypoint_sets[b]
            m = match_descriptors(ka, kb, mp)
            u = ka.xy
            v_xy = kb.xy[m.j]
            key, sub = jax.random.split(key)
            res, R_rel, t_rel = estimate_relative_pose(
                sub, u, v_xy, m.mask, Kj, Kj,
                threshold_px=config.rel_pose_threshold_px,
                num_samples=config.rel_pose_samples,
                min_inliers=config.min_pair_inliers)
            if not bool(res.success):
                continue
            inl = np.asarray(res.inliers) & np.asarray(m.mask)
            edges.append((a, b))
            edge_R.append(np.asarray(R_rel))
            edge_t.append(np.asarray(t_rel) / max(np.linalg.norm(np.asarray(t_rel)), 1e-12))
            edge_feats.append((np.asarray(m.i)[inl], np.asarray(m.j)[inl]))
            tracker.add_matches(a, b, np.asarray(m.i)[inl], np.asarray(m.j)[inl])

    _mark("pair_stage")
    if len(edges) < V - 1:
        raise RuntimeError(
            f"epipolar graph too sparse: {len(edges)} edges for {V} views")

    # --- Stage 3: rotation averaging. ---
    ei = jnp.asarray([e[0] for e in edges], jnp.int32)
    ej = jnp.asarray([e[1] for e in edges], jnp.int32)
    R_abs = np.asarray(average_rotations(V, ei, ej,
                                         jnp.asarray(np.stack(edge_R))))
    R_avg_snapshot = R_abs.copy()
    _mark("rotation_averaging")

    # --- Stage 4: translation averaging. ---
    u_dirs = np.stack([-(R_abs[e[1]].T @ t) for e, t in zip(edges, edge_t)])
    # Per-edge baseline scales from shared-track depth ratios: direction-only
    # averaging is rank-deficient on flexible graphs (straight camera rows —
    # see sfm/edge_scales.py); with scales known the center solve is rigid.
    from sara_tpu.sfm.edge_scales import (estimate_edge_scales,
                                          solve_centers_fixed_scales)

    scales = estimate_edge_scales(
        edges, edge_R, edge_t, edge_feats,
        [np.asarray(k.xy) for k in keypoint_sets], np.asarray(K))
    covered = float(np.mean(scales != 1.0))
    if config.edge_scale_translation and covered >= 0.5:
        centers = solve_centers_fixed_scales(V, edges, u_dirs, scales)
        base = np.linalg.norm(centers[[e[1] for e in edges]]
                              - centers[[e[0] for e in edges]], axis=1)
        med = np.median(base[base > 0]) if (base > 0).any() else 1.0
        centers = centers / max(med, 1e-12)
    else:
        centers = _translation_averaging(V, edges, u_dirs,
                                         iters=config.translation_iters)
    t_abs = np.stack([-R_abs[v] @ centers[v] for v in range(V)])
    centers_avg = centers.copy()
    _mark("translation_averaging")

    # --- Stage 4b: pose-graph polish over the epipolar graph. ---
    if config.pose_graph_iters > 0 and len(edges) >= V:
        from sara_tpu.sfm.pose_graph_opt import (PoseGraphProblem,
                                                 optimize_pose_graph)

        E_n = len(edges)
        poses6 = np.zeros((V, 6))
        for v in range(V):
            poses6[v, :3] = np.asarray(lie.so3_log(jnp.asarray(R_abs[v])))
            poses6[v, 3:] = t_abs[v]
        rel = np.zeros((E_n, 6))
        ok_e = np.zeros(E_n, bool)
        for k, ((a, b), Rr, tu) in enumerate(zip(edges, edge_R, edge_t)):
            # Metric edge translation: unit direction scaled by the
            # averaged baseline length.
            s_e = float(np.linalg.norm(centers[b] - centers[a]))
            if s_e < 1e-9:
                continue
            rel[k, :3] = np.asarray(lie.so3_log(jnp.asarray(Rr)))
            rel[k, 3:] = s_e * tu
            ok_e[k] = True
        prob_pg = PoseGraphProblem(
            poses=jnp.asarray(poses6),
            edge_i=jnp.asarray([e[0] for e in edges], jnp.int32),
            edge_j=jnp.asarray([e[1] for e in edges], jnp.int32),
            rel_pose=jnp.asarray(rel),
            weight=jnp.ones(E_n),
            edge_mask=jnp.asarray(ok_e),
            pose_fixed=jnp.asarray([True] + [False] * (V - 1)),
        )
        out_pg, _info_pg = optimize_pose_graph(
            prob_pg, max_iters=config.pose_graph_iters)
        p6 = np.asarray(out_pg.poses)
        R_abs = np.stack([np.asarray(lie.so3_exp(jnp.asarray(p6[v, :3])))
                          for v in range(V)])
        t_abs = p6[:, 3:]
        _mark("pose_graph_polish")

    # --- Stage 5: tracks + multi-view triangulation. ---
    tracker.compute_tracks(config.min_track_length)
    members = tracker.track_members()
    track_ids = sorted(members.keys())
    if not track_ids:
        raise RuntimeError("no feature tracks")
    max_len = max(len(members[t][0]) for t in track_ids)
    T = len(track_ids)
    P_pad = np.zeros((T, max_len, 3, 4))
    uv_pad = np.zeros((T, max_len, 2))
    m_pad = np.zeros((T, max_len), bool)
    # K-normalized cameras and image coordinates: entries stay O(1), which
    # the f32 (TPU) DLT needs for accurate triangulation.
    Kinv = np.linalg.inv(K)
    P_all = np.concatenate([R_abs, t_abs[:, :, None]], axis=2)
    for ti, tid in enumerate(track_ids):
        frames, feats = members[tid]
        for k, (f, ft) in enumerate(zip(frames, feats)):
            P_pad[ti, k] = P_all[f]
            xy = np.asarray(keypoint_sets[f].xy)[ft]
            xyn = Kinv @ np.array([xy[0], xy[1], 1.0])
            uv_pad[ti, k] = xyn[:2] / xyn[2]
            m_pad[ti, k] = True
    X = np.asarray(_multiview_triangulate(
        jnp.asarray(P_pad), jnp.asarray(uv_pad), jnp.asarray(m_pad)))
    _mark("tracks_triangulation")

    # Cheirality / sanity filter.
    good_pt = np.isfinite(X).all(axis=1) & (np.linalg.norm(X, axis=1) < 1e3)
    for ti, tid in enumerate(track_ids):
        frames, _ = members[tid]
        z = np.einsum("ij,j->i", R_abs[frames[0]], X[ti]) + t_abs[frames[0]]
        if z[2] <= 0:
            good_pt[ti] = False

    # --- Stage 6: global BA. ---
    obs_cam, obs_pt, obs_uv = [], [], []
    kept = {}
    for ti, tid in enumerate(track_ids):
        if not good_pt[ti]:
            continue
        kept[ti] = len(kept)
        frames, feats = members[tid]
        for f, ft in zip(frames, feats):
            obs_cam.append(f)
            obs_pt.append(kept[ti])
            obs_uv.append(np.asarray(keypoint_sets[f].xy)[ft])
    Xk = X[good_pt]
    pose_fixed = np.zeros(V, bool)
    pose_fixed[0] = True
    poses6 = np.zeros((V, 6))
    for v in range(V):
        poses6[v, :3] = np.asarray(lie.so3_log(jnp.asarray(R_abs[v])))
        poses6[v, 3:] = t_abs[v]
    intr = np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]])
    prob = BAProblem(
        poses=jnp.asarray(poses6),
        points=jnp.asarray(Xk),
        intrinsics=jnp.asarray(intr),
        cam_idx=jnp.asarray(np.asarray(obs_cam, np.int32)),
        pt_idx=jnp.asarray(np.asarray(obs_pt, np.int32)),
        uv=jnp.asarray(np.asarray(obs_uv)),
        obs_mask=jnp.ones(len(obs_cam), bool),
        pose_fixed=jnp.asarray(pose_fixed),
        point_fixed=jnp.zeros(len(Xk), bool),
    )
    if config.ba_blocks > 0:
        from sara_tpu.ba.partitioned import partitioned_bundle_adjust

        out, info = partitioned_bundle_adjust(
            prob, config.ba_blocks, config.ba_options,
            sweeps=config.ba_sweeps, mesh=ba_mesh)
    else:
        out, info = bundle_adjust(prob, config.ba_options)
    float(info["final_cost"])  # honest sync before timing the stage
    _mark("bundle_adjustment")

    poses_out = np.asarray(out.poses)
    R_fin = np.stack([np.asarray(lie.so3_exp(jnp.asarray(poses_out[v, :3])))
                      for v in range(V)])
    return {
        "R": R_fin,
        "t": poses_out[:, 3:],
        "points": np.asarray(out.points),
        "tracker": tracker,
        "num_edges": len(edges),
        "n_obs": len(obs_cam),
        "ba_problem": prob,
        "ba_info": {k: np.asarray(v) for k, v in info.items()},
        "stage_times": stage_t,
        # Stage diagnostics (probe_city_stages.py / probe_sfm_ate_stages.py).
        "edges": edges,
        "edge_R": edge_R,
        "edge_t": edge_t,
        "R_averaged": R_avg_snapshot,
        "centers_averaged": centers_avg,
        "centers_polished": np.stack(
            [-R_abs[v].T @ t_abs[v] for v in range(V)]),
    }
