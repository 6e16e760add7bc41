"""IO tests: image round trip, video round trip (generated mp4), Strecha
camera file parsing, im2col GEMM conv, nuScenes table loader."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from sara_tpu.image.im2col import im2col, gemm_conv2d
from sara_tpu.io import imread, imwrite, imread_gray, read_strecha_camera
from sara_tpu.io.video import VideoStream, VideoWriter


def test_image_roundtrip(tmp_path, rng):
    img = (rng.random((32, 48, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    imwrite(p, img)
    back = imread(p)
    np.testing.assert_array_equal(back, img)
    g = imread_gray(p)
    assert g.shape == (32, 48) and g.dtype == np.float32


def test_video_roundtrip(tmp_path, rng):
    frames = [(rng.random((64, 96, 3)) * 255).astype(np.uint8)
              for _ in range(10)]
    p = str(tmp_path / "v.mp4")
    w = VideoWriter(p, (64, 96), fps=10)
    for f in frames:
        w.write(f)
    w.close()
    vs = VideoStream(p)
    got = list(vs)
    assert len(got) == 10
    assert got[0].shape == (64, 96, 3)
    #

    vs2 = VideoStream(p, num_skips=1)
    assert len(list(vs2)) == 5


def test_strecha_camera(tmp_path):
    K = np.array([[2759.48, 0, 1520.69], [0, 2764.16, 1006.81], [0, 0, 1]])
    p = str(tmp_path / "img.camera")
    with open(p, "w") as f:
        for row in K:
            f.write(" ".join(str(v) for v in row) + "\n")
        f.write("0\n")
    got = read_strecha_camera(p)
    np.testing.assert_allclose(got, K)


def test_im2col_gemm_conv(rng):
    img = jnp.asarray(rng.random((16, 20)).astype(np.float32))
    k = jnp.asarray(rng.random((3, 3)).astype(np.float32))
    ours = np.asarray(gemm_conv2d(img, k))
    from scipy.signal import correlate2d

    ref = correlate2d(np.asarray(img), np.asarray(k), mode="valid")
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_nuscenes_loader(tmp_path):
    from sara_tpu.io.nuscenes import NuScenesTables

    root = tmp_path / "v1.0-mini"
    os.makedirs(root)
    tables = {
        "sensor": [{"token": "s1", "channel": "CAM_FRONT", "modality": "camera"}],
        "calibrated_sensor": [{"token": "c1", "sensor_token": "s1",
                               "camera_intrinsic": [[1000, 0, 800],
                                                    [0, 1000, 450],
                                                    [0, 0, 1]],
                               "rotation": [1, 0, 0, 0],
                               "translation": [0, 0, 0]}],
        "ego_pose": [{"token": "e1", "rotation": [1, 0, 0, 0],
                      "translation": [0, 0, 0], "timestamp": 1}],
        "sample_data": [{"token": "d1", "calibrated_sensor_token": "c1",
                         "ego_pose_token": "e1", "timestamp": 1,
                         "filename": "a.jpg"}],
        "scene": [], "sample": [],
    }
    for name, rows in tables.items():
        with open(root / f"{name}.json", "w") as f:
            json.dump(rows, f)
    ns = NuScenesTables(str(tmp_path))
    frames = ns.camera_frames("CAM_FRONT")
    assert len(frames) == 1
    assert frames[0]["camera_intrinsic"][0][0] == 1000


def test_html_viewer(tmp_path, rng):
    from sara_tpu.viz.html_viewer import write_html_viewer

    pts = rng.normal(size=(100, 3))
    traj = np.cumsum(rng.normal(size=(10, 3)) * 0.1, axis=0)
    p = write_html_viewer(str(tmp_path / "cloud.html"), pts,
                          colors=rng.random((100, 3)), trajectory=traj)
    html = open(p).read()
    assert "PTS" in html and html.count("#") > 50
    assert "TRAJ" in html


def test_pipeline_config_json_roundtrip():
    from sara_tpu.config import PipelineConfig, CameraConfig
    from sara_tpu.image.pyramid import PyramidParams

    cfg = PipelineConfig(
        camera=CameraConfig(fx=512.0, k1=-0.1),
        pyramid=PyramidParams(first_octave=-1),
        match_ratio=0.7)
    text = cfg.to_json()
    back = PipelineConfig.from_json(text)
    assert back.camera.fx == 512.0
    assert back.camera.k1 == -0.1
    assert back.pyramid.first_octave == -1
    assert back.match_ratio == 0.7
    assert back.camera.has_distortion()
    sp = back.sift_params()
    assert sp.pyramid.first_octave == -1


def test_two_view_geometry_h5_roundtrip(tmp_path):
    from sara_tpu.io import (load_two_view_geometry_h5,
                             save_two_view_geometry_h5)

    rs = np.random.RandomState(0)
    path = str(tmp_path / "tv.h5")
    E = rs.normal(size=(3, 3))
    R = np.eye(3)
    t = np.array([1.0, 0, 0])
    X = rs.normal(size=(50, 3))
    inl = rs.rand(50) > 0.3
    save_two_view_geometry_h5(path, E=E, R=R, t=t, X=X, inliers=inl,
                              K1=np.eye(3))
    out = load_two_view_geometry_h5(path)
    np.testing.assert_allclose(out["E"], E)
    np.testing.assert_allclose(out["X"], X)
    np.testing.assert_array_equal(out["inliers"], inl)
    assert "F" not in out  # absent optional fields are not written


def test_nuscenes_annotations_and_projection(tmp_path):
    from sara_tpu.io.nuscenes import NuScenesAnnotations

    root = tmp_path / "v1.0-mini"
    os.makedirs(root)
    tables = {
        "sensor": [{"token": "s1", "channel": "CAM_FRONT",
                    "modality": "camera"}],
        "calibrated_sensor": [{"token": "c1", "sensor_token": "s1",
                               "camera_intrinsic": [[1000, 0, 800],
                                                    [0, 1000, 450],
                                                    [0, 0, 1]],
                               "rotation": [1, 0, 0, 0],
                               "translation": [0, 0, 0]}],
        "ego_pose": [{"token": "e1", "rotation": [1, 0, 0, 0],
                      "translation": [0, 0, 0], "timestamp": 1}],
        "sample_data": [{"token": "d1", "sample_token": "smp1",
                         "calibrated_sensor_token": "c1",
                         "ego_pose_token": "e1", "timestamp": 1,
                         "filename": "a.jpg"}],
        "scene": [], "sample": [{"token": "smp1"}],
        "sample_annotation": [
            {"token": "a1", "sample_token": "smp1",
             "instance_token": "i1", "visibility_token": "4",
             "attribute_tokens": [], "translation": [2.0, 1.0, 10.0],
             "size": [1.8, 4.5, 1.6], "rotation": [1, 0, 0, 0],
             "num_lidar_pts": 12, "num_radar_pts": 2,
             "prev": "", "next": ""},
            {"token": "a2", "sample_token": "smp1",
             "instance_token": "i1", "visibility_token": "4",
             "attribute_tokens": [], "translation": [0.0, 0.0, -5.0],
             "size": [1, 1, 1], "rotation": [1, 0, 0, 0],
             "num_lidar_pts": 1, "num_radar_pts": 0,
             "prev": "", "next": ""},
        ],
        "instance": [{"token": "i1", "category_token": "cat1",
                      "nbr_annotations": 2}],
        "category": [{"token": "cat1", "name": "vehicle.car",
                      "description": ""}],
        "attribute": [], "visibility": [],
    }
    for name, rows in tables.items():
        with open(root / f"{name}.json", "w") as f:
            json.dump(rows, f)
    ns = NuScenesAnnotations(str(tmp_path))
    anns = ns.annotations_of_sample("smp1")
    assert len(anns) == 2
    assert anns[0]["category_name"] == "vehicle.car"
    frame = ns.camera_frames("CAM_FRONT")[0]
    boxes = ns.boxes_in_camera(frame)
    # Identity transforms: the z=10 box projects; the z=-5 one is culled.
    assert len(boxes) == 1
    uv = boxes[0]["uv"]
    assert abs(uv[0] - (1000 * 2.0 / 10 + 800)) < 1e-6
    assert abs(boxes[0]["depth"] - 10.0) < 1e-9


def test_webp_heif_formats(tmp_path, rng):
    import pytest
    from sara_tpu.io.image import imread, imwrite, supported_formats

    fmts = supported_formats()
    assert fmts["jpeg"] and fmts["png"]
    img = (rng.uniform(size=(32, 48, 3)) * 255).astype("uint8")
    if fmts["webp"]:
        p = str(tmp_path / "x.webp")
        imwrite(p, img, lossless=True)
        back = imread(p)
        assert back.shape == img.shape
        assert (back == img).all()
    else:  # pragma: no cover - PIL is built with webp in CI images
        pytest.skip("PIL lacks WebP")
    if fmts["heif"]:  # pragma: no cover - needs optional pillow_heif
        p = str(tmp_path / "x.heic")
        imwrite(p, img)
        assert imread(p).shape == img.shape
    else:
        with pytest.raises(RuntimeError, match="pillow_heif"):
            imread(str(tmp_path / "missing.heic"))
