"""I/O: images, video, datasets, feature serialization, checkpoints."""

from sara_tpu.io.image import imread, imwrite, imread_gray
from sara_tpu.io.video import VideoStream, VideoWriter
from sara_tpu.io.datasets import read_strecha_camera, load_image_pair
from sara_tpu.io.features_io import (
    save_keypoints_h5, load_keypoints_h5, save_matches_h5, load_matches_h5,
    save_two_view_geometry_h5, load_two_view_geometry_h5)
from sara_tpu.io.checkpoint import save_sfm_state, load_sfm_state

__all__ = [
    "imread", "imwrite", "imread_gray",
    "VideoStream", "VideoWriter",
    "read_strecha_camera", "load_image_pair",
    "save_keypoints_h5", "load_keypoints_h5",
    "save_matches_h5", "load_matches_h5",
    "save_two_view_geometry_h5", "load_two_view_geometry_h5",
    "save_sfm_state", "load_sfm_state",
]
