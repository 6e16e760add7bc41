"""Incremental SfM/VO pipeline integration tests on synthetic sequences.

Drives OdometryPipeline.process_keypoints with synthetic keypoints whose
descriptors identify world points uniquely (perfect matching), so the test
isolates the geometric pipeline: relative pose, tracks, PnP, triangulation,
windowed BA. Trajectory is checked by ATE after similarity alignment
(BASELINE.md config 2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from geometry_fixtures import default_K
from sara_tpu.core.types import Keypoints
from sara_tpu.sfm import OdometryPipeline, OdometryConfig, FeatureTracker
from sara_tpu.sfm.disjoint_sets import DisjointSets, connected_components
from sara_tpu.utils import ate_rmse


def _make_sequence(n_frames=10, n_points=300, noise=0.3, seed=0, capacity=512):
    """Cameras orbiting a point cloud; returns (keypoint sets, gt centers)."""
    rs = np.random.RandomState(seed)
    X = rs.uniform(-4, 4, (n_points, 3)) + np.array([0, 0, 12.0])
    # Spread points along the forward path so long sequences (the camera
    # advances 0.5 units/frame) never run out of visible scene.
    X[:, 2] = rs.uniform(8.0, 12.0 + 0.5 * n_frames, n_points)
    desc = rs.normal(size=(n_points, 128))
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    K = default_K()

    kps = []
    centers = []
    for f in range(n_frames):
        # Bounded yaw sweep: an unboundedly growing yaw turns the camera
        # away from the (forward-distributed) scene on long sequences.
        ang = 0.35 * np.sin(0.1 * f)
        R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        c = np.array([2.0 * np.sin(0.1 * f), 0.1 * f, 0.5 * f])
        t = -R @ c
        centers.append(c)
        Xc = X @ R.T + t
        vis = Xc[:, 2] > 1.0
        uv = (Xc @ K.T)
        uv = uv[:, :2] / uv[:, 2:]
        inside = (uv[:, 0] >= 0) & (uv[:, 0] < 1024) & (uv[:, 1] >= 0) & (uv[:, 1] < 768)
        vis &= inside
        idx = np.nonzero(vis)[0][:capacity]
        n = len(idx)
        xy = np.zeros((capacity, 2), np.float32)
        xy[:n] = uv[idx] + rs.normal(scale=noise, size=(n, 2))
        d = np.zeros((capacity, 128), np.float32)
        d[:n] = desc[idx]
        mask = np.zeros(capacity, bool)
        mask[:n] = True
        kp = Keypoints(
            xy=jnp.asarray(xy),
            scale=jnp.asarray(np.full(capacity, 2.0, np.float32)),
            orientation=jnp.asarray(np.zeros(capacity, np.float32)),
            response=jnp.asarray(np.where(mask, 1.0, 0.0).astype(np.float32)),
            descriptors=jnp.asarray(d),
            mask=jnp.asarray(mask),
        )
        kps.append(kp)
    return kps, np.asarray(centers), K


def test_disjoint_sets_native_or_fallback():
    ds = DisjointSets(10)
    ds.union_edges(np.array([0, 1, 5]), np.array([1, 2, 6]))
    c = ds.components()
    assert c[0] == c[1] == c[2]
    assert c[5] == c[6]
    assert c[0] != c[5]
    labels, k = connected_components(6, np.array([0, 2]), np.array([1, 3]))
    assert k == 4


def test_tracker_basic():
    tr = FeatureTracker()
    f0 = tr.add_frame(5, np.ones(5))
    f1 = tr.add_frame(5, np.ones(5))
    f2 = tr.add_frame(5, np.ones(5))
    tr.add_matches(f0, f1, [0, 1], [2, 3])
    tr.add_matches(f1, f2, [2], [4])
    labels, k = tr.compute_tracks(min_length=2)
    # Track A: f0:0 - f1:2 - f2:4; Track B: f0:1 - f1:3.
    assert k == 2
    gid = tr.global_id(f2, [4])[0]
    assert labels[gid] >= 0
    members = tr.track_members()
    lens = sorted(len(v[0]) for v in members.values())
    assert lens == [2, 3]


def test_tracker_incremental_matches_batch():
    """The native incremental NMS core and the NumPy batch path must agree
    bit-for-bit on randomized multi-frame match graphs (incl. component
    merges, response ties, and min-length filtering)."""
    rs = np.random.RandomState(7)
    from sara_tpu.sfm.tracker import FeatureTracker

    def build(seed):
        rs = np.random.RandomState(seed)
        tr = FeatureTracker()
        F, N = 12, 40
        for f in range(F):
            # Quantized responses force ties to exercise the gid tiebreak.
            tr.add_frame(N, rs.randint(0, 4, N).astype(np.float32))
        for f in range(1, F):
            m = rs.randint(5, 15)
            tr.add_matches(f - 1, f, rs.randint(0, N, m), rs.randint(0, N, m))
        # A long-range (loop-closure-like) edge batch that merges old
        # components.
        tr.add_matches(0, F - 1, rs.randint(0, N, 6), rs.randint(0, N, 6))
        return tr

    for seed in range(5):
        a = build(seed)
        b = build(seed)
        for min_len in (2, 3):
            la, ka = a.compute_tracks(min_len)          # incremental (native)
            lb, kb = b._compute_tracks_batch(min_len)   # batch oracle
            assert ka == kb
            np.testing.assert_array_equal(la, lb)
            np.testing.assert_array_equal(a.comp_min_gid[a.component_of_feature],
                                          b.comp_min_gid[b.component_of_feature])
            np.testing.assert_array_equal(a.rep_of_track, b.rep_of_track)


def test_tracker_incremental_calls_interleaved():
    """Incremental calls after each frame must equal one batch call at the
    end (the VO pipeline calls compute_tracks every frame)."""
    from sara_tpu.sfm.tracker import FeatureTracker

    rs = np.random.RandomState(3)
    inc = FeatureTracker()
    bat = FeatureTracker()
    F, N = 10, 30
    for f in range(F):
        resp = rs.randint(0, 3, N).astype(np.float32)
        inc.add_frame(N, resp)
        bat.add_frame(N, resp)
        if f:
            m = rs.randint(4, 12)
            ia, ib = rs.randint(0, N, m), rs.randint(0, N, m)
            inc.add_matches(f - 1, f, ia, ib)
            bat.add_matches(f - 1, f, ia, ib)
        inc.compute_tracks(2)  # exercised every frame
    la, ka = inc.compute_tracks(2)
    lb, kb = bat._compute_tracks_batch(2)
    assert ka == kb
    np.testing.assert_array_equal(la, lb)


def test_vo_pipeline_10_frames():
    kps, centers_gt, K = _make_sequence(n_frames=10, noise=0.2)
    cfg = OdometryConfig(rel_pose_samples=200, pnp_samples=200,
                         rel_pose_min_inliers=50, pnp_min_inliers=20,
                         ba_window=6)
    pipe = OdometryPipeline(K, cfg)
    accepted = 0
    for f, kp in enumerate(kps):
        if pipe.process_keypoints(kp, f):
            accepted += 1
    assert accepted == 10, f"only {accepted}/10 frames accepted"
    traj = pipe.pose_graph.trajectory()
    err = ate_rmse(traj, centers_gt)
    # Trajectory spans ~5 units; demand small relative ATE.
    assert err < 0.15, f"ATE {err}"
    assert pipe.point_cloud.num_points > 100


def test_vo_pipeline_noise_free_is_tight():
    kps, centers_gt, K = _make_sequence(n_frames=8, noise=0.0, seed=3)
    cfg = OdometryConfig(rel_pose_samples=200, pnp_samples=200,
                         rel_pose_min_inliers=50, pnp_min_inliers=20,
                         ba_window=0)
    pipe = OdometryPipeline(K, cfg)
    for f, kp in enumerate(kps):
        pipe.process_keypoints(kp, f)
    traj = pipe.pose_graph.trajectory()
    err = ate_rmse(traj, centers_gt)
    assert err < 0.02, f"ATE {err}"


def test_track_merge_barycenter_propagation():
    """Two tracks that later merge must unify their scene points as the
    barycenter under a stable key (reference:
    PointCloudGenerator::propagate_scene_point_indices)."""
    from sara_tpu.sfm.tracker import FeatureTracker
    from sara_tpu.sfm.pointcloud import PointCloudGenerator

    tr = FeatureTracker()
    for _ in range(3):
        tr.add_frame(4, np.ones(4, np.float32))
    # Two disjoint 2-frame tracks: (f0,0)-(f1,0) and (f1,1)-(f2,1).
    tr.add_matches(0, 1, np.array([0]), np.array([0]))
    tr.add_matches(1, 2, np.array([1]), np.array([1]))
    tr.compute_tracks(min_length=2)
    pc = PointCloudGenerator()
    reps = tr.rep_of_tracks(np.arange(tr.num_tracks))
    assert len(reps) == 2
    pc.add_points(reps, np.array([[0.0, 0.0, 5.0], [2.0, 0.0, 7.0]]))
    assert pc.num_points == 2
    p0 = pc.point_of_track(int(reps[0])).copy()

    # A new match fuses the two tracks through frame 1.
    tr.add_matches(0, 1, np.array([0]), np.array([1]))
    tr.compute_tracks(min_length=2)
    pc.propagate(tr)
    assert tr.num_tracks == 1
    rep_new = int(tr.rep_of_tracks(np.array([0]))[0])
    merged = pc.point_of_track(rep_new)
    np.testing.assert_allclose(merged, [1.0, 0.0, 6.0])  # barycenter
    # Exactly one live key remains.
    assert len(pc.scene_point_of_track) == 1


def test_rep_stability_across_generations():
    """Representatives survive re-labelling when unrelated tracks appear."""
    from sara_tpu.sfm.tracker import FeatureTracker

    tr = FeatureTracker()
    for _ in range(2):
        tr.add_frame(8, np.ones(8, np.float32))
    tr.add_matches(0, 1, np.array([5]), np.array([5]))
    tr.compute_tracks(min_length=2)
    rep_a = int(tr.rep_of_tracks(np.array([0]))[0])
    # New frame + a track with SMALLER gids shifts dense numbering.
    tr.add_frame(8, np.ones(8, np.float32))
    tr.add_matches(0, 1, np.array([0]), np.array([0]))
    tr.add_matches(1, 2, np.array([3]), np.array([3]))
    tr.compute_tracks(min_length=2)
    reps_now = set(int(r) for r in tr.rep_of_tracks(np.arange(tr.num_tracks)))
    assert rep_a in reps_now  # the old track kept its stable key


@pytest.mark.slow
def test_windowed_vo_scale_drift_bounded():
    """Monocular windowed BA with the scale gauge (freeze one translation
    component at start, second window pose when sliding): the
    reconstruction scale at the END of a 60-frame run must stay close to
    the scale at the START (VERDICT round-1 weak #3 — the gauge used to
    be dead code and scale was free to drift window-to-window)."""
    kps, centers_gt, K = _make_sequence(n_frames=60, n_points=800, noise=0.3)
    cfg = OdometryConfig(rel_pose_samples=300, pnp_samples=300,
                         rel_pose_min_inliers=40, pnp_min_inliers=20,
                         ba_window=8)
    pipe = OdometryPipeline(K, cfg)
    ok = [bool(pipe.process_keypoints(kp, f)) for f, kp in enumerate(kps)]
    assert sum(ok) >= 58
    traj = pipe.pose_graph.trajectory()
    gt = centers_gt[np.flatnonzero(ok)]
    # Per-segment scale = |est step| / |gt step|; compare early vs late.
    seg_est = np.linalg.norm(np.diff(traj, axis=0), axis=1)
    seg_gt = np.linalg.norm(np.diff(gt, axis=0), axis=1)
    ratio = seg_est / np.maximum(seg_gt, 1e-9)
    early = np.median(ratio[:15])
    late = np.median(ratio[-15:])
    drift = late / early
    assert 0.8 < drift < 1.25, f"scale drift {drift} (early {early}, late {late})"
