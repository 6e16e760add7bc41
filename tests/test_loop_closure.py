"""Loop-closure VO test (BASELINE config 3, scaled down): a circular
synthetic trajectory whose drift is corrected by pose-graph optimization."""

import numpy as np
import pytest

import jax.numpy as jnp

from geometry_fixtures import default_K
from sara_tpu.core.types import Keypoints
from sara_tpu.sfm import OdometryPipeline, OdometryConfig
from sara_tpu.sfm.loop_closure import LoopCloser, LoopClosureConfig
from sara_tpu.utils import ate_rmse


def _make_loop_sequence(n_frames=24, n_points=600, noise=0.25, seed=0,
                        capacity=512, radius=6.0):
    """Camera orbiting the scene center on a closed circle; points on a
    surrounding cylinder so every frame sees structure."""
    rs = np.random.RandomState(seed)
    ang_p = rs.uniform(0, 2 * np.pi, n_points)
    rad_p = rs.uniform(radius + 4.0, radius + 12.0, n_points)
    X = np.stack([rad_p * np.sin(ang_p), rs.uniform(-3, 3, n_points),
                  rad_p * np.cos(ang_p)], axis=1)
    desc = rs.normal(size=(n_points, 128))
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    K = default_K()

    kps, centers = [], []
    for f in range(n_frames):
        ang = 2 * np.pi * f / n_frames
        # Camera on the circle, looking outward.
        c = radius * np.array([np.sin(ang), 0.0, np.cos(ang)])
        R = np.array([[np.cos(ang), 0, -np.sin(ang)], [0, 1, 0],
                      [np.sin(ang), 0, np.cos(ang)]]).T
        t = -R @ c
        centers.append(c)
        Xc = X @ R.T + t
        vis = Xc[:, 2] > 1.0
        uv = Xc @ K.T
        uv = uv[:, :2] / uv[:, 2:]
        inside = ((uv[:, 0] >= 0) & (uv[:, 0] < 1024)
                  & (uv[:, 1] >= 0) & (uv[:, 1] < 768))
        idx = np.nonzero(vis & inside)[0][:capacity]
        n = len(idx)
        xy = np.zeros((capacity, 2), np.float32)
        xy[:n] = uv[idx] + rs.normal(scale=noise, size=(n, 2))
        d = np.zeros((capacity, 128), np.float32)
        d[:n] = desc[idx]
        mask = np.zeros(capacity, bool)
        mask[:n] = True
        kps.append(Keypoints(
            xy=jnp.asarray(xy),
            scale=jnp.asarray(np.full(capacity, 2.0, np.float32)),
            orientation=jnp.zeros(capacity, jnp.float32),
            response=jnp.asarray(mask.astype(np.float32)),
            descriptors=jnp.asarray(d),
            mask=jnp.asarray(mask)))
    return kps, np.asarray(centers), K


@pytest.mark.slow
def test_loop_closure_reduces_drift():
    kps, centers_gt, K = _make_loop_sequence()
    cfg = OdometryConfig(rel_pose_samples=200, pnp_samples=200,
                         rel_pose_min_inliers=40, pnp_min_inliers=15,
                         ba_window=5)
    pipe = OdometryPipeline(K, cfg)
    closer = LoopCloser(K, LoopClosureConfig(min_gap=15, min_inliers=40,
                                             rel_pose_samples=200))
    accepted = 0
    for f, kp in enumerate(kps):
        if pipe.process_keypoints(kp, f):
            closer.add_frame(kp)
            accepted += 1
    assert accepted >= 22, f"only {accepted} frames accepted"

    err_before = ate_rmse(pipe.pose_graph.trajectory(), centers_gt[:accepted])
    closed = closer.close(pipe, accepted - 1)
    assert closed, "no loop detected"
    err_after = ate_rmse(pipe.pose_graph.trajectory(), centers_gt[:accepted])
    # Loop closure must not hurt and should measurably help when drift
    # exists; always demand a sane final ATE.
    assert err_after <= err_before * 1.05 + 1e-6
    assert err_after < 0.5, f"ATE after closure {err_after}"
