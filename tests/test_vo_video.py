"""VideoStream -> OdometryPipeline glue: encode a rendered distorted
sequence to mp4, stream it back with frame skipping, undistort via
precomputed Brown-Conrady maps, and recover the trajectory.

Scaled-down version of scripts/eval_vo_video.py (the reference's primary
demo mode: video file + hardcoded intrinsics + distortion corrector;
reference: cpp/src/DO/Sara/VideoIO/VideoStream.hpp:76,
SfM/Odometry/VideoStreamer.hpp:11-69).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from render3d import make_room, render
from sara_tpu.core.cameras import BrownConrady, undistortion_maps
from sara_tpu.io.video import VideoStream, VideoWriter
from sara_tpu.sfm import OdometryConfig, OdometryPipeline
from sara_tpu.utils import ate_rmse


@pytest.mark.slow
def test_video_stream_to_odometry(tmp_path):
    hw = (240, 320)
    f = 260.0
    cam = BrownConrady.from_values(f, f, hw[1] / 2, hw[0] / 2,
                                   k=(-0.2, 0.04, 0.0), p=(1e-3, -5e-4))
    K = np.array([[f, 0, hw[1] / 2], [0, f, hw[0] / 2], [0, 0, 1.0]])
    planes = make_room(seed=1)

    # Distorted pixel grid -> rays through the Brown-Conrady model.
    ys, xs = np.mgrid[0:hw[0], 0:hw[1]].astype(np.float32)
    uv = jnp.asarray(np.stack([xs, ys], axis=-1).reshape(-1, 2))
    rays = np.asarray(cam.backproject(uv))

    def pose(i):
        ang = 0.02 * i
        R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        c = np.array([0.25 * i, 0.0, 0.3 * i])
        return R, -R @ c, c

    # Encode 2x the frames we intend to process; num_skips=1 halves them.
    n_encoded = 10
    centers = []
    video_path = str(tmp_path / "room.mp4")
    vw = VideoWriter(video_path, hw, fps=10.0)
    for i in range(n_encoded):
        R, t, c = pose(i)
        img = render(planes, K, R, t, hw=hw, rays_cam=rays)
        u8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        vw.write(np.stack([u8] * 3, axis=-1))
        centers.append(c)
    vw.close()
    centers = np.asarray(centers)

    maps = undistortion_maps(cam, *hw)
    cfg = OdometryConfig(rel_pose_samples=300, pnp_samples=300,
                         rel_pose_min_inliers=40, pnp_min_inliers=15,
                         ba_window=6)
    pipe = OdometryPipeline(K, cfg, undistortion_maps=maps)

    vs = VideoStream(video_path, num_skips=1)
    assert vs.sizes == hw
    ok, streamed = [], []
    for frame in vs:
        assert frame.shape == hw + (3,) and frame.dtype == np.uint8
        ok.append(bool(pipe.process_frame(jnp.asarray(frame), vs.frame_index)))
        streamed.append(vs.frame_index)
    vs.close()

    assert streamed == [1, 3, 5, 7, 9]  # num_skips=1 -> every other frame
    accepted = sum(ok)
    assert accepted >= len(streamed) - 1, f"only {accepted} accepted"
    gt_sel = centers[np.asarray(streamed)[np.flatnonzero(ok)]]
    err = ate_rmse(pipe.pose_graph.trajectory(), gt_sel)
    # Lossy mp4v pixels + undistortion resampling: allow 2x the clean-image
    # bound of test_vo_from_images (trajectory spans ~3 units).
    assert err < 0.4, f"ATE {err}"
