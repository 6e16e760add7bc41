"""Bundle adjustment tests on synthetic multi-view scenes (cf. reference
cpp/test/Sara/MultiViewGeometry/test_multiviewgeometry_ceres_solver_backend.cpp
and the two-view BA example, SURVEY.md §3.4)."""

import jax
import jax.numpy as jnp
import numpy as np

from geometry_fixtures import make_cube_vertices, default_K, project, rotation_distance
from sara_tpu.ba import BAProblem, BAOptions, bundle_adjust, ba_cost
from sara_tpu.core import lie


def _make_ba_problem(n_cams=4, n_pts=60, noise=0.5, perturb=True, seed=0,
                     n_bad_obs=0):
    rs = np.random.RandomState(seed)
    X = make_cube_vertices(center=(0, 0, 8.0), side=4.0, n_extra=n_pts - 8,
                          seed=seed)
    K = default_K()
    intr = np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]])

    poses_gt = []
    for c in range(n_cams):
        # Cameras on an arc looking at the cube, with small random
        # pitch/roll (pure-yaw rigs leave fy unobservable in
        # self-calibrating BA: an anamorphic y-scaling of the scene
        # compensates it exactly).
        ang = 0.15 * (c - (n_cams - 1) / 2)
        R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        px, rz = rs.normal(scale=0.08, size=2)
        Rx = np.array([[1, 0, 0], [0, np.cos(px), -np.sin(px)],
                       [0, np.sin(px), np.cos(px)]])
        Rz = np.array([[np.cos(rz), -np.sin(rz), 0],
                       [np.sin(rz), np.cos(rz), 0], [0, 0, 1]])
        R = R @ Rx @ Rz
        t = np.array([-1.5 * ang * 8.0 * 0.15, 0.0, 0.0]) + rs.normal(scale=0.02, size=3)
        poses_gt.append((R, t))

    cam_idx, pt_idx, uvs = [], [], []
    for c, (R, t) in enumerate(poses_gt):
        uv, depth = project(K, R, t, X)
        uv = uv + rs.normal(scale=noise, size=uv.shape)
        for i in range(len(X)):
            if depth[i] > 0:
                cam_idx.append(c)
                pt_idx.append(i)
                uvs.append(uv[i])
    cam_idx = np.asarray(cam_idx, np.int32)
    pt_idx = np.asarray(pt_idx, np.int32)
    uvs = np.asarray(uvs)
    if n_bad_obs:
        bad = rs.choice(len(uvs), n_bad_obs, replace=False)
        uvs[bad] += rs.uniform(30, 80, size=(n_bad_obs, 2))

    # Initial estimates: perturbed ground truth.
    poses0 = []
    for c, (R, t) in enumerate(poses_gt):
        w = lie.so3_log(jnp.asarray(R))
        w = np.asarray(w)
        if perturb and c > 0:
            w = w + rs.normal(scale=0.01, size=3)
            t = t + rs.normal(scale=0.05, size=3)
        poses0.append(np.concatenate([w, t]))
    points0 = X + (rs.normal(scale=0.05, size=X.shape) if perturb else 0.0)

    pose_fixed = np.zeros(n_cams, bool)
    pose_fixed[0] = True  # gauge

    prob = BAProblem(
        poses=jnp.asarray(np.stack(poses0)),
        points=jnp.asarray(points0),
        intrinsics=jnp.asarray(intr),
        cam_idx=jnp.asarray(cam_idx),
        pt_idx=jnp.asarray(pt_idx),
        uv=jnp.asarray(uvs),
        obs_mask=jnp.ones(len(uvs), bool),
        pose_fixed=jnp.asarray(pose_fixed),
        point_fixed=jnp.zeros(len(X), bool),
    )
    return prob, poses_gt, X


def test_ba_reduces_cost():
    prob, poses_gt, X_gt = _make_ba_problem()
    opts = BAOptions(max_iters=20)
    out, info = bundle_adjust(prob, opts)
    assert float(info["final_cost"]) < 0.5 * float(info["initial_cost"])


def test_ba_recovers_poses():
    prob, poses_gt, X_gt = _make_ba_problem(noise=0.0)
    opts = BAOptions(max_iters=30)
    out, info = bundle_adjust(prob, opts)
    # With zero observation noise, BA must drive the cost to ~0 and recover
    # the ground-truth poses.
    assert float(info["final_cost"]) < 1e-4 * float(info["initial_cost"])
    for c in range(1, prob.poses.shape[0]):
        R = np.asarray(lie.so3_exp(out.poses[c, :3]))
        assert rotation_distance(R, poses_gt[c][0]) < 1e-3
        np.testing.assert_allclose(np.asarray(out.poses[c, 3:]),
                                   poses_gt[c][1], atol=5e-3)


def test_ba_gauge_frozen():
    prob, *_ = _make_ba_problem()
    out, _ = bundle_adjust(prob, BAOptions(max_iters=5))
    np.testing.assert_array_equal(np.asarray(out.poses[0]),
                                  np.asarray(prob.poses[0]))


def test_ba_robust_to_bad_observations():
    prob, poses_gt, _ = _make_ba_problem(noise=0.3, n_bad_obs=20, seed=2)
    out, info = bundle_adjust(prob, BAOptions(max_iters=30))
    for c in range(1, prob.poses.shape[0]):
        R = np.asarray(lie.so3_exp(out.poses[c, :3]))
        assert rotation_distance(R, poses_gt[c][0]) < 5e-3


def test_ba_masked_obs_ignored():
    prob, *_ = _make_ba_problem(noise=0.0)
    # Corrupt half the observations but mask them out: result must still be
    # near-exact.
    n = prob.uv.shape[0]
    # Random half (masking a contiguous camera-ordered prefix could leave a
    # whole camera unconstrained).
    bad = np.zeros(n, bool)
    bad[np.random.RandomState(7).choice(n, n // 2, replace=False)] = True
    uv = np.asarray(prob.uv).copy()
    uv[bad] += 500.0
    prob2 = prob._replace(uv=jnp.asarray(uv),
                          obs_mask=jnp.asarray(~bad))
    out, info = bundle_adjust(prob2, BAOptions(max_iters=30))
    assert float(info["final_cost"]) < 1e-4


def test_ba_component_freeze_pins_scale():
    """A (C, 6) pose_fixed mask freezes individual components: the second
    camera's largest translation component must not move (monocular gauge,
    cf. the odometry windowed-BA gauge)."""
    prob, *_ = _make_ba_problem()
    C = prob.poses.shape[0]
    pf = np.zeros((C, 6), bool)
    pf[0] = True
    comp = 3 + int(np.argmax(np.abs(np.asarray(prob.poses)[1, 3:])))
    pf[1, comp] = True
    prob2 = prob._replace(pose_fixed=jnp.asarray(pf))
    out, info = bundle_adjust(prob2, BAOptions(max_iters=10))
    assert float(info["final_cost"]) < 0.9 * float(info["initial_cost"])
    np.testing.assert_array_equal(np.asarray(out.poses[0]),
                                  np.asarray(prob.poses[0]))
    assert float(out.poses[1, comp]) == float(prob.poses[1, comp])
    # Other components of pose 1 did move.
    assert not np.allclose(np.asarray(out.poses[1]), np.asarray(prob.poses[1]))


def test_ba_recovers_intrinsics():
    """Self-calibrating BA (reference packs intrinsics as parameters,
    BundleAdjuster.cpp:162-210): a 5% focal/center perturbation must be
    recovered when intr_free opts the intrinsics into the solve."""
    prob, poses_gt, X_gt = _make_ba_problem(noise=0.0, n_cams=6, n_pts=80)
    intr_gt = np.asarray(prob.intrinsics)
    intr0 = intr_gt * np.array([1.05, 1.05, 0.97, 1.04])
    prob2 = prob._replace(intrinsics=jnp.asarray(intr0),
                          intr_free=jnp.ones(4, bool))
    out, info = bundle_adjust(prob2, BAOptions(max_iters=60))
    rec = np.asarray(out.intrinsics)
    assert float(info["final_cost"]) < 1e-3 * float(info["initial_cost"])
    np.testing.assert_allclose(rec[:2], intr_gt[:2], rtol=0.005)
    np.testing.assert_allclose(rec[2:], intr_gt[2:], atol=5.0)


def test_ba_intr_free_mask_respected():
    prob, *_ = _make_ba_problem(noise=0.0)
    intr0 = np.asarray(prob.intrinsics) * np.array([1.03, 1.03, 1.0, 1.0])
    free = np.array([True, True, False, False])
    prob2 = prob._replace(intrinsics=jnp.asarray(intr0),
                          intr_free=jnp.asarray(free))
    out, _ = bundle_adjust(prob2, BAOptions(max_iters=40))
    rec = np.asarray(out.intrinsics)
    # Frozen center must be bit-identical; focals must have moved.
    np.testing.assert_array_equal(rec[2:], intr0[2:])
    assert abs(rec[0] - intr0[0]) > 1.0


def test_ba_brown_conrady_residual():
    """(8,)-intrinsics problems project through the Brown-Conrady model:
    observations generated WITH distortion must reach ~zero cost only when
    the distortion coefficients are supplied."""
    from sara_tpu.ba.core import ba_cost as _cost

    prob, poses_gt, X_gt = _make_ba_problem(noise=0.0, perturb=False)
    dist = np.array([-0.12, 0.03, 1e-3, -5e-4])
    intr8 = np.concatenate([np.asarray(prob.intrinsics), dist])

    # Re-render the observations through the distorted model.
    from sara_tpu.ba.core import project_obs

    p8 = prob._replace(intrinsics=jnp.asarray(intr8))
    uv_dist, _ = project_obs(p8)
    p8 = p8._replace(uv=uv_dist)
    assert float(_cost(p8)) < 1e-6
    # The pinhole-only model on the same uv has a large residual.
    p4 = prob._replace(uv=uv_dist)
    assert float(_cost(p4)) > 1e2


def test_ba_optimizes_distortion():
    """Perturbed k1/k2 recovered by the self-calibrating solve."""
    prob, *_ = _make_ba_problem(noise=0.0, n_cams=6, n_pts=80)
    dist = np.array([-0.12, 0.03, 0.0, 0.0])
    intr8 = np.concatenate([np.asarray(prob.intrinsics), dist])
    from sara_tpu.ba.core import project_obs

    gt8 = prob._replace(intrinsics=jnp.asarray(intr8))
    uv_dist, _ = project_obs(gt8)
    # Solve from zero distortion with k1, k2 free.
    intr0 = np.concatenate([np.asarray(prob.intrinsics), np.zeros(4)])
    free = np.array([False, False, False, False, True, True, False, False])
    p = prob._replace(intrinsics=jnp.asarray(intr0), uv=uv_dist,
                      intr_free=jnp.asarray(free))
    out, info = bundle_adjust(p, BAOptions(max_iters=60))
    rec = np.asarray(out.intrinsics)
    assert float(info["final_cost"]) < 1e-2 * float(info["initial_cost"])
    np.testing.assert_allclose(rec[4:6], dist[:2], atol=0.02)


def test_closed_form_jacobians_match_autodiff():
    """ba/jacobian.py flat closed form == vmapped jacfwd (machine
    precision), including tiny-angle poses."""
    import jax

    from sara_tpu.ba.core import _project
    from sara_tpu.ba.jacobian import pinhole_jacobians

    rs = np.random.RandomState(0)
    O, C, P = 400, 6, 50
    for scale in (0.5, 1e-8):
        poses = jnp.asarray(rs.normal(scale=scale, size=(C, 6)))
        points = jnp.asarray(rs.normal(scale=2.0, size=(P, 3))
                             + np.array([0, 0, 8.0]))
        intr = jnp.asarray([800.0, 820.0, 512.0, 384.0])
        ci = jnp.asarray(rs.randint(0, C, O))
        pi = jnp.asarray(rs.randint(0, P, O))
        uv = jnp.asarray(rs.normal(size=(O, 2)))

        r, Jcf, Jpf = pinhole_jacobians(poses, points, intr, ci, pi, uv)

        def res_one(pose6, X, u):
            pred, _ = _project(intr, pose6, X)
            return pred - u

        def one(c, p, u):
            return (res_one(poses[c], points[p], u),
                    jax.jacfwd(res_one, 0)(poses[c], points[p], u),
                    jax.jacfwd(res_one, 1)(poses[c], points[p], u))

        r2, Jc2, Jp2 = jax.vmap(one)(ci, pi, uv)
        np.testing.assert_allclose(np.asarray(r), np.asarray(r2), atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(Jcf).reshape(O, 2, 6), np.asarray(Jc2),
            rtol=1e-6, atol=1e-5 * float(jnp.abs(Jc2).max()))
        np.testing.assert_allclose(
            np.asarray(Jpf).reshape(O, 2, 3), np.asarray(Jp2),
            rtol=1e-6, atol=1e-5 * float(jnp.abs(Jp2).max()))


def test_flat_fast_path_matches_autodiff_path():
    """bundle_adjust's flat pinhole path == the autodiff path (forced via
    an all-frozen intr_free mask, which is semantically identical)."""
    prob = _make_ba_problem()[0]
    # solver="cg": this test compares the closed-form-Jacobian CG program
    # against the autodiff CG program — the dense solver is covered by its
    # own parity tests.
    opts = BAOptions(max_iters=8, cg_iters=12, solver="cg")
    out_fast, info_fast = bundle_adjust(prob, opts)
    frozen = prob._replace(intr_free=jnp.zeros(4, bool))
    out_slow, info_slow = bundle_adjust(frozen, opts)
    np.testing.assert_allclose(np.asarray(out_fast.poses),
                               np.asarray(out_slow.poses), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_fast.points),
                               np.asarray(out_slow.points), atol=1e-4)
    assert abs(float(info_fast["final_cost"])
               - float(info_slow["final_cost"])) < 1e-3 * (
        1.0 + float(info_slow["final_cost"]))


def test_dense_schur_matches_cg():
    """The explicit dense-Schur direct solver and the matrix-free Schur+PCG
    path must converge to the same optimum (the dense path takes exact
    steps, so iterates differ; final costs/poses must agree)."""
    prob, poses_gt, X_gt = _make_ba_problem(n_cams=5, n_pts=80, noise=0.4,
                                            n_bad_obs=6)
    dense, di = bundle_adjust(prob, BAOptions(max_iters=25, solver="dense"))
    cg, ci = bundle_adjust(prob, BAOptions(max_iters=40, cg_iters=40,
                                           solver="cg"))
    fd, fc = float(di["final_cost"]), float(ci["final_cost"])
    assert fd <= fc * 1.02, (fd, fc)
    np.testing.assert_allclose(np.asarray(dense.poses), np.asarray(cg.poses),
                               atol=2e-3)
    # Both must beat the initial cost decisively.
    assert fd < 0.3 * float(di["initial_cost"])


def test_dense_schur_respects_freezes():
    """Component-level pose freezing and fixed points hold exactly in the
    dense path (gauge semantics identical to the CG path)."""
    prob, _, _ = _make_ba_problem(n_cams=4, n_pts=50, noise=0.3)
    C = prob.poses.shape[0]
    pf = np.zeros((C, 6), bool)
    pf[0] = True
    pf[1, 3] = True  # one translation component of camera 1
    ptfix = np.zeros(prob.points.shape[0], bool)
    ptfix[:5] = True
    prob2 = prob._replace(pose_fixed=jnp.asarray(pf),
                          point_fixed=jnp.asarray(ptfix))
    out, info = bundle_adjust(prob2, BAOptions(max_iters=15, solver="dense"))
    np.testing.assert_allclose(np.asarray(out.poses[0]),
                               np.asarray(prob.poses[0]), atol=1e-12)
    np.testing.assert_allclose(float(out.poses[1, 3]),
                               float(prob.poses[1, 3]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.points[:5]),
                               np.asarray(prob.points[:5]), atol=1e-12)
    assert float(info["final_cost"]) < float(info["initial_cost"])


def _make_local_visibility_problem(n_cams=16, pts_per_cam=40, noise=0.4,
                                   seed=0):
    """Cameras on a line, each seeing only nearby structure — the
    local-visibility regime keyframe/map-block partitioning targets
    (city-scale sequences; a full-visibility cube is the adversarial
    opposite: every camera constrains every block)."""
    rs = np.random.RandomState(seed)
    K = default_K()
    intr = np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]])
    X, cam_idx, pt_idx, uvs = [], [], [], []
    poses_gt = []
    for c in range(n_cams):
        R = np.eye(3)
        t = np.array([-1.0 * c, 0.0, 0.0])
        poses_gt.append((R, t))
    pid = 0
    for c in range(n_cams):
        Xc = rs.uniform(-2, 2, (pts_per_cam, 3)) + np.array([c, 0, 9.0])
        for x in Xc:
            X.append(x)
            for cc in range(max(0, c - 2), min(n_cams, c + 3)):
                R, t = poses_gt[cc]
                xc = R @ x + t
                if xc[2] <= 1:
                    continue
                uv = intr[:2] * xc[:2] / xc[2] + intr[2:]
                if 0 <= uv[0] < 1024 and 0 <= uv[1] < 768:
                    cam_idx.append(cc)
                    pt_idx.append(pid)
                    uvs.append(uv + rs.normal(scale=noise, size=2))
            pid += 1
    X = np.asarray(X)
    poses0 = np.zeros((n_cams, 6))
    for c, (R, t) in enumerate(poses_gt):
        poses0[c, 3:] = t + (rs.normal(scale=0.03, size=3) if c else 0)
        poses0[c, :3] = rs.normal(scale=0.005, size=3) if c else 0
    pose_fixed = np.zeros(n_cams, bool)
    pose_fixed[0] = True
    prob = BAProblem(
        poses=jnp.asarray(poses0),
        points=jnp.asarray(X + rs.normal(scale=0.05, size=X.shape)),
        intrinsics=jnp.asarray(intr),
        cam_idx=jnp.asarray(np.asarray(cam_idx, np.int32)),
        pt_idx=jnp.asarray(np.asarray(pt_idx, np.int32)),
        uv=jnp.asarray(np.asarray(uvs)),
        obs_mask=jnp.ones(len(uvs), bool),
        pose_fixed=jnp.asarray(pose_fixed),
        point_fixed=jnp.zeros(len(X), bool),
    )
    return prob


def test_partitioned_ba_approaches_global():
    """Keyframe/map-block partitioned BA (block-Jacobi sweeps of vmapped
    dense-Schur sub-problems) must reach nearly the global optimum in the
    local-visibility regime it targets."""
    from sara_tpu.ba.partitioned import partitioned_bundle_adjust

    prob = _make_local_visibility_problem()
    ref, ri = bundle_adjust(prob, BAOptions(max_iters=25))
    out, info = partitioned_bundle_adjust(
        prob, n_blocks=4, opts=BAOptions(max_iters=12), sweeps=4)
    from sara_tpu.ba import ba_cost
    c_ref = float(ba_cost(ref, 4.0, 6.0))
    c_par = float(ba_cost(out, 4.0, 6.0))
    c_init = float(ba_cost(prob, 4.0, 6.0))
    # Partitioned must capture most of the global improvement.
    assert c_par < c_init * 0.02
    assert c_par < c_ref * 1.3 + 1e-6, (c_par, c_ref, c_init)


def test_partitioned_ba_on_mesh():
    """The block axis shards over a device mesh (virtual CPU mesh here):
    same result as the unsharded partitioned solve."""
    from sara_tpu.ba.partitioned import partitioned_bundle_adjust
    from sara_tpu.parallel import make_mesh

    prob = _make_local_visibility_problem(n_cams=12, pts_per_cam=25)
    a, _ = partitioned_bundle_adjust(prob, n_blocks=4,
                                     opts=BAOptions(max_iters=8), sweeps=2)
    mesh = make_mesh(4, axis="block")
    b, _ = partitioned_bundle_adjust(prob, n_blocks=4,
                                     opts=BAOptions(max_iters=8), sweeps=2,
                                     mesh=mesh)
    np.testing.assert_allclose(np.asarray(a.poses), np.asarray(b.poses),
                               atol=1e-8)


def test_dense_schur_session_matches_one_shot():
    """DenseSchurSession (device-resident pack-once path) reproduces the
    one-shot bundle_adjust dense result, and a value-refreshed re-solve
    equals re-packing from scratch."""
    from sara_tpu.ba import DenseSchurSession

    prob, *_ = _make_ba_problem(n_cams=6, n_pts=80, seed=3)
    opts = BAOptions(max_iters=8, solver="dense")

    out, info = bundle_adjust(prob, opts)
    sess = DenseSchurSession(prob, opts)
    assert sess.eligible
    poses_s, points_s, info_s = sess.solve()
    np.testing.assert_allclose(np.asarray(poses_s), np.asarray(out.poses),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(points_s), np.asarray(out.points),
                               rtol=0, atol=1e-9)
    assert float(info_s["final_cost"]) == float(info["final_cost"])

    # Refresh with perturbed values; must equal a fresh pack of the same
    # problem with those values.
    rs = np.random.RandomState(7)
    poses2 = np.asarray(prob.poses) + np.concatenate(
        [np.zeros((1, 6)), rs.normal(scale=1e-3, size=(prob.poses.shape[0] - 1, 6))])
    points2 = np.asarray(prob.points) + rs.normal(scale=1e-2,
                                                  size=prob.points.shape)
    poses_r, points_r, info_r = sess.solve(poses=jnp.asarray(poses2),
                                           points=jnp.asarray(points2))
    prob2 = prob._replace(poses=jnp.asarray(poses2),
                          points=jnp.asarray(points2))
    out2, info2 = bundle_adjust(prob2, opts)
    np.testing.assert_allclose(np.asarray(poses_r), np.asarray(out2.poses),
                               rtol=0, atol=1e-9)
    assert float(info_r["final_cost"]) == float(info2["final_cost"])

    # Chained solve (no value override) continues from the resident
    # solution rather than the initial one.
    _, _, info_c = sess.solve()
    assert float(info_c["initial_cost"]) <= float(info_r["final_cost"]) + 1e-6
