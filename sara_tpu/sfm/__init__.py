"""Host-side incremental SfM: pose graph, feature tracks, point cloud,
odometry pipeline.

TPU-native rebuild of the reference SfM layer
(reference: cpp/src/DO/Sara/SfM/). Graph bookkeeping runs on the host
(NumPy + native C++ union-find); all per-frame heavy compute (detection,
matching, RANSAC, triangulation, BA) runs as jitted device programs with
fixed-capacity buffers.
"""

from sara_tpu.sfm.disjoint_sets import DisjointSets, connected_components
from sara_tpu.sfm.tracker import FeatureTracker
from sara_tpu.sfm.pose_graph import CameraPoseGraph
from sara_tpu.sfm.pointcloud import PointCloudGenerator
from sara_tpu.sfm.odometry import OdometryPipeline, OdometryConfig

__all__ = [
    "DisjointSets", "connected_components", "FeatureTracker",
    "CameraPoseGraph", "PointCloudGenerator",
    "OdometryPipeline", "OdometryConfig",
]
