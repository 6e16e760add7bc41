"""Pose-graph optimization + rotation averaging tests (BASELINE config 3
building blocks; no reference counterpart — SURVEY.md §5)."""

import jax.numpy as jnp
import numpy as np

from geometry_fixtures import rotation_distance
from sara_tpu.core import lie
from sara_tpu.sfm.pose_graph_opt import (
    PoseGraphProblem, optimize_pose_graph, pose_graph_cost, edge_residual,
    relative_pose_to_packing)
from sara_tpu.sfm.rotation_averaging import average_rotations


def _circle_trajectory(n, radius=5.0):
    """Ground-truth poses on a loop."""
    poses = []
    for k in range(n):
        ang = 2 * np.pi * k / n
        R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        c = radius * np.array([np.sin(ang), 0.0, 1.0 - np.cos(ang)])
        t = -R @ c
        poses.append((R, t))
    return poses


def _rel(pa, pb):
    """Relative motion a->b: T_b T_a^-1."""
    Ra, ta = pa
    Rb, tb = pb
    R = Rb @ Ra.T
    t = tb - R @ ta
    return R, t


def test_edge_residual_zero_for_consistent():
    poses = _circle_trajectory(4)
    pk = []
    for R, t in poses:
        pk.append(np.concatenate([np.asarray(lie.so3_log(jnp.asarray(R))), t]))
    R, t = _rel(poses[0], poses[1])
    meas = relative_pose_to_packing(R, t)
    r = edge_residual(jnp.asarray(pk[0]), jnp.asarray(pk[1]), meas)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-8)


def test_loop_closure_corrects_drift():
    n = 30
    rs = np.random.RandomState(0)
    gt = _circle_trajectory(n)

    # Odometry chain with drift: integrate noisy relative poses.
    noisy = [gt[0]]
    edges = []
    for k in range(1, n):
        R, t = _rel(gt[k - 1], gt[k])
        Rn = np.asarray(lie.so3_exp(jnp.asarray(
            lie.so3_log(jnp.asarray(R)) + rs.normal(scale=0.01, size=3))))
        tn = t + rs.normal(scale=0.02, size=3)
        Rp, tp = noisy[-1]
        noisy.append((Rn @ Rp, Rn @ tp + tn))
        edges.append((k - 1, k, R, t, 1.0))
    # Loop-closure edge with the exact measurement.
    Rlc, tlc = _rel(gt[n - 1], gt[0])
    edges.append((n - 1, 0, Rlc, tlc, 10.0))

    packed = np.stack([
        np.concatenate([np.asarray(lie.so3_log(jnp.asarray(R))), t])
        for R, t in noisy])
    E = len(edges)
    prob = PoseGraphProblem(
        poses=jnp.asarray(packed),
        edge_i=jnp.asarray([e[0] for e in edges], jnp.int32),
        edge_j=jnp.asarray([e[1] for e in edges], jnp.int32),
        rel_pose=jnp.stack([relative_pose_to_packing(e[2], e[3]) for e in edges]),
        weight=jnp.asarray([e[4] for e in edges]),
        edge_mask=jnp.ones(E, bool),
        pose_fixed=jnp.asarray([True] + [False] * (n - 1)),
    )
    c0 = float(pose_graph_cost(prob))
    out, info = optimize_pose_graph(prob, max_iters=25)
    cf = float(info["final_cost"])
    assert cf < 0.1 * c0

    # Drifted endpoint error must shrink substantially after optimization.
    def center(p6):
        R = np.asarray(lie.so3_exp(jnp.asarray(p6[:3])))
        return -R.T @ np.asarray(p6[3:])

    before = np.linalg.norm(center(packed[n - 1]) - (-gt[n - 1][0].T @ gt[n - 1][1]))
    after = np.linalg.norm(center(np.asarray(out.poses[n - 1]))
                           - (-gt[n - 1][0].T @ gt[n - 1][1]))
    assert after < 0.5 * before, f"before {before}, after {after}"


def test_rotation_averaging():
    n = 20
    rs = np.random.RandomState(1)
    gt = _circle_trajectory(n)
    edge_i, edge_j, Rrels = [], [], []
    for k in range(n):
        for d in (1, 2):
            j = (k + d) % n
            R, _ = _rel(gt[k], gt[j])
            Rn = np.asarray(lie.so3_exp(jnp.asarray(
                lie.so3_log(jnp.asarray(R)) + rs.normal(scale=0.01, size=3))))
            edge_i.append(k)
            edge_j.append(j)
            Rrels.append(Rn)
    R_est = average_rotations(
        n, jnp.asarray(edge_i, jnp.int32), jnp.asarray(edge_j, jnp.int32),
        jnp.asarray(np.stack(Rrels)))
    R_est = np.asarray(R_est)
    # Compare up to the global gauge R_est[0] = I vs gt[0][0].
    G = gt[0][0] @ R_est[0].T
    errs = [rotation_distance(G @ R_est[k], gt[k][0]) for k in range(n)]
    assert max(errs) < 0.05, f"max rotation error {max(errs)}"


def test_rotation_averaging_with_outliers():
    n = 16
    rs = np.random.RandomState(2)
    gt = _circle_trajectory(n)
    edge_i, edge_j, Rrels = [], [], []
    for k in range(n):
        for d in (1, 2, 3):
            j = (k + d) % n
            R, _ = _rel(gt[k], gt[j])
            edge_i.append(k)
            edge_j.append(j)
            Rrels.append(R)
    # Corrupt 15% of edges with random rotations.
    bad = rs.choice(len(Rrels), len(Rrels) * 15 // 100, replace=False)
    for b in bad:
        w = rs.normal(size=3)
        Rrels[b] = np.asarray(lie.so3_exp(jnp.asarray(w)))
    R_est = np.asarray(average_rotations(
        n, jnp.asarray(edge_i, jnp.int32), jnp.asarray(edge_j, jnp.int32),
        jnp.asarray(np.stack(Rrels))))
    G = gt[0][0] @ R_est[0].T
    errs = [rotation_distance(G @ R_est[k], gt[k][0]) for k in range(n)]
    assert max(errs) < 0.1, f"max rotation error {max(errs)}"


def test_cg_matches_dense():
    """The matrix-free CG path must reach the same optimum as the dense
    solve on a drifted loop (method="cg" forced on a small graph)."""
    n = 30
    rs = np.random.RandomState(3)
    gt = _circle_trajectory(n)
    noisy = [gt[0]]
    edges = []
    for k in range(1, n):
        R, t = _rel(gt[k - 1], gt[k])
        Rn = np.asarray(lie.so3_exp(jnp.asarray(
            lie.so3_log(jnp.asarray(R)) + rs.normal(scale=0.01, size=3))))
        tn = t + rs.normal(scale=0.02, size=3)
        Rp, tp = noisy[-1]
        noisy.append((Rn @ Rp, Rn @ tp + tn))
        edges.append((k - 1, k, R, t, 1.0))
    Rlc, tlc = _rel(gt[n - 1], gt[0])
    edges.append((n - 1, 0, Rlc, tlc, 10.0))
    packed = np.stack([
        np.concatenate([np.asarray(lie.so3_log(jnp.asarray(R))), t])
        for R, t in noisy])
    E = len(edges)
    prob = PoseGraphProblem(
        poses=jnp.asarray(packed),
        edge_i=jnp.asarray([e[0] for e in edges], jnp.int32),
        edge_j=jnp.asarray([e[1] for e in edges], jnp.int32),
        rel_pose=jnp.stack([relative_pose_to_packing(e[2], e[3]) for e in edges]),
        weight=jnp.asarray([e[4] for e in edges]),
        edge_mask=jnp.ones(E, bool),
        pose_fixed=jnp.asarray([True] + [False] * (n - 1)),
    )
    c0 = float(pose_graph_cost(prob))
    out_d, info_d = optimize_pose_graph(prob, max_iters=30, method="dense")
    out_c, info_c = optimize_pose_graph(prob, max_iters=30, method="cg",
                                        cg_iters=100)
    cc = float(info_c["final_cost"])
    # Exact-measurement edges: the optimum cost is machine zero; both
    # paths must reach (near) it and agree.
    assert float(info_d["final_cost"]) < 1e-12 * c0
    assert cc < 1e-6 * c0, f"cg {cc} vs initial {c0}"
    np.testing.assert_allclose(np.asarray(out_c.poses),
                               np.asarray(out_d.poses), atol=1e-3)


def test_huber_edges_resist_outlier_edge():
    """With huber_delta on, one wildly wrong loop edge must not drag the
    optimized graph away from the consistent odometry chain (VERDICT r3
    weak #1: closure degraded ATE on one backend)."""
    import jax.numpy as jnp
    from sara_tpu.sfm.pose_graph_opt import (PoseGraphProblem,
                                             optimize_pose_graph,
                                             relative_pose_to_packing)

    rs = np.random.RandomState(0)
    N = 12
    # Ground-truth chain along x; consistent chain edges.
    poses = np.zeros((N, 6))
    poses[:, 3] = -np.arange(N, dtype=float)   # t = -R c with R = I
    ei, ej, rels, w = [], [], [], []
    for i in range(N - 1):
        ei.append(i)
        ej.append(i + 1)
        rels.append(np.asarray(relative_pose_to_packing(
            np.eye(3), np.array([-1.0, 0, 0]))))
        w.append(np.ones(6))
    # A false loop edge claiming frame 0 and frame N-1 coincide.
    ei.append(0)
    ej.append(N - 1)
    rels.append(np.asarray(relative_pose_to_packing(np.eye(3), np.zeros(3))))
    w.append(np.full(6, 10.0))

    init = poses + np.concatenate(
        [np.zeros((1, 6)), rs.normal(scale=0.01, size=(N - 1, 6))])
    prob = PoseGraphProblem(
        poses=jnp.asarray(init),
        edge_i=jnp.asarray(ei, jnp.int32), edge_j=jnp.asarray(ej, jnp.int32),
        rel_pose=jnp.asarray(np.stack(rels)),
        weight=jnp.asarray(np.stack(w)),
        edge_mask=jnp.ones(len(ei), bool),
        pose_fixed=jnp.asarray([True] + [False] * (N - 1)))

    robust, _ = optimize_pose_graph(prob, max_iters=30, huber_delta=0.5,
                                    outlier_cutoff=6.0)
    quad, _ = optimize_pose_graph(prob, max_iters=30)
    err_rob = np.abs(np.asarray(robust.poses)[:, 3] - poses[:, 3]).max()
    err_quad = np.abs(np.asarray(quad.poses)[:, 3] - poses[:, 3]).max()
    # Robust: chain wins (small error); quadratic: false edge drags poses.
    assert err_rob < 0.25, err_rob
    assert err_rob < 0.3 * err_quad, (err_rob, err_quad)


def test_sim3_closure_fixes_scale_drift():
    """Monocular SCALE drift: odometry translations grow by a smooth
    per-step factor (total 1.35x around the loop) while rotations stay
    exact. An SE(3) pose graph cannot express this — its 'closure' only
    trades the inconsistency around the loop as shape distortion — while
    the Sim(3) graph (poses carry log-scale; the loop edge is measured in
    true scale, odometry edges softly prefer relative scale 1) recovers
    the trajectory (Strasdat et al., RSS 2010)."""
    n = 40
    gt = _circle_trajectory(n)
    drift_total = 1.35

    noisy = [gt[0]]
    edges = []
    for k in range(1, n):
        R, t = _rel(gt[k - 1], gt[k])
        s_k = drift_total ** (k / (n - 1.0))       # smooth scale drift
        Rp, tp = noisy[-1]
        noisy.append((R @ Rp, R @ tp + s_k * t))
        # Odometry edges are measured from the DRIFTED chain (what VO
        # integrated), relative scale believed to be 1 (log-scale 0).
        edges.append((k - 1, k, R, s_k * t, 1.0, 0.0))
    Rlc, tlc = _rel(gt[n - 1], gt[0])
    # The loop edge carries a MEASURED relative scale (in the pipeline:
    # median depth ratio of co-observed structure between the two frames'
    # map sections — LoopCloser.verify_metric); without it the scale-1
    # claim contradicts the drift and Sim(3) converges to a warped
    # compromise (measured: ATE 0.19 vs the 0.0005 below).
    edges.append((n - 1, 0, Rlc, tlc, 10.0, np.log(1.0 / drift_total)))

    def build(dim):
        packed = np.stack([
            np.concatenate([np.asarray(lie.so3_log(jnp.asarray(R))), t,
                            np.zeros(dim - 6)])
            for R, t in noisy])
        rels = [np.concatenate(
            [np.asarray(relative_pose_to_packing(e[2], e[3])),
             [e[5]][: dim - 6]]) for e in edges]
        w = np.ones((len(edges), dim))
        w[-1] *= edges[-1][4]
        return PoseGraphProblem(
            poses=jnp.asarray(packed),
            edge_i=jnp.asarray([e[0] for e in edges], jnp.int32),
            edge_j=jnp.asarray([e[1] for e in edges], jnp.int32),
            rel_pose=jnp.asarray(np.stack(rels)),
            weight=jnp.asarray(w),
            edge_mask=jnp.ones(len(edges), bool),
            pose_fixed=jnp.asarray([True] + [False] * (n - 1)),
        )

    gt_centers = np.stack([-R.T @ t for R, t in gt])

    def ate(poses):
        poses = np.asarray(poses)
        cs = []
        for p in poses:
            R = np.asarray(lie.so3_exp(jnp.asarray(p[:3])))
            tt = np.asarray(p[3:6])
            if p.shape[0] == 7:
                tt = tt / np.exp(p[6])
            cs.append(-R.T @ tt)
        from sara_tpu.utils import ate_rmse

        return ate_rmse(np.stack(cs), gt_centers)

    before = ate(build(6).poses)
    out6, _ = optimize_pose_graph(build(6), max_iters=30)
    out7, _ = optimize_pose_graph(build(7), max_iters=30)
    ate6, ate7 = ate(out6.poses), ate(out7.poses)
    # Sim(3) must beat both the drifted input and the SE(3) closure by a
    # wide margin (scale drift is exactly its extra degree of freedom) —
    # measured 0.0005 vs before 0.37 / SE(3) 0.28.
    assert ate7 < 0.1 * min(before, ate6), \
        f"before {before:.4f}, se3 {ate6:.4f}, sim3 {ate7:.4f}"
    # ... and recover the planted total drift in its scale states.
    s_end = float(np.exp(np.asarray(out7.poses)[-1, 6]))
    assert abs(s_end - drift_total) < 0.05 * drift_total
