"""Full image-based VO integration test: rendered 3-D room -> SIFT ->
matching -> E-RANSAC -> PnP -> triangulation -> BA -> trajectory.

This exercises the ENTIRE pipeline from pixels (the keypoint-level tests in
test_sfm_pipeline.py bypass detection/description).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from render3d import make_room, render
from sara_tpu.sfm import OdometryPipeline, OdometryConfig
from sara_tpu.utils import ate_rmse


@pytest.mark.slow
def test_vo_on_rendered_room():
    K = np.array([[260.0, 0, 160.0], [0, 260.0, 120.0], [0, 0, 1.0]])
    planes = make_room(seed=1)

    def pose(i):
        # Translate right and slightly forward, with a small yaw.
        ang = 0.02 * i
        R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        c = np.array([0.25 * i, 0.0, 0.3 * i])
        return R, -R @ c, c

    n_frames = 6
    imgs, centers = [], []
    for i in range(n_frames):
        R, t, c = pose(i)
        imgs.append(render(planes, K, R, t))
        centers.append(c)
    centers = np.asarray(centers)

    cfg = OdometryConfig(
        rel_pose_samples=300, pnp_samples=300,
        rel_pose_min_inliers=40, pnp_min_inliers=15,
        ba_window=6)
    pipe = OdometryPipeline(K, cfg)
    ok = [bool(pipe.process_frame(jnp.asarray(img), f))
          for f, img in enumerate(imgs)]
    accepted = sum(ok)
    assert accepted >= n_frames - 1, f"only {accepted}/{n_frames} accepted"
    traj = pipe.pose_graph.trajectory()
    # Pair each accepted pose with the ground-truth center of the frame it
    # came from (a mid-sequence rejection must not shift the pairing).
    err = ate_rmse(traj, centers[np.flatnonzero(ok)])
    # Trajectory spans ~2 units; demand sub-10% ATE from raw pixels.
    assert err < 0.2, f"ATE {err}"
    assert pipe.point_cloud.num_points > 50


@pytest.mark.slow
def test_vo_batched_frontend_matches_sequential():
    """process_frames (multi-frame fused dispatch) reconstructs the same
    trajectory as the per-frame path on the rendered room."""
    K = np.array([[260.0, 0, 160.0], [0, 260.0, 120.0], [0, 0, 1.0]])
    planes = make_room(seed=1)

    def pose(i):
        ang = 0.02 * i
        R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        c = np.array([0.25 * i, 0.0, 0.3 * i])
        return R, -R @ c, c

    n_frames = 5
    imgs, centers = [], []
    for i in range(n_frames):
        R, t, c = pose(i)
        imgs.append(jnp.asarray(render(planes, K, R, t)))
        centers.append(c)
    centers = np.asarray(centers)

    cfg = OdometryConfig(
        rel_pose_samples=300, pnp_samples=300,
        rel_pose_min_inliers=40, pnp_min_inliers=15,
        ba_window=6, frontend_batch=2)
    pipe = OdometryPipeline(K, cfg)
    ok = [bool(o) for o in pipe.process_frames(imgs, list(range(n_frames)))]
    accepted = sum(ok)
    assert accepted >= n_frames - 1, f"only {accepted}/{n_frames} accepted"
    traj = pipe.pose_graph.trajectory()
    err = ate_rmse(traj, centers[np.flatnonzero(ok)])
    assert err < 0.2, f"ATE {err}"
