"""Checkpoint / resume of the incremental SfM state.

The reference has no checkpointing (SURVEY.md §5); long sequences must be
resumable in this framework. The pose graph + map + tracker state are plain
host data, serialized as a compressed NPZ (+ JSON-able metadata inside).
"""

from __future__ import annotations

import json

import numpy as np


def save_sfm_state(path: str, pipeline):
    """Serialize an OdometryPipeline's graph/map/tracker state."""
    pg = pipeline.pose_graph
    pc = pipeline.point_cloud
    tr = pipeline.tracker
    meta = {
        "num_poses": len(pg),
        "frame_indices": [p.frame_index for p in pg.poses],
        "tracker_offsets": tr.offsets,
        "tracker_counts": tr.counts,
        "scene_point_of_track": {str(k): int(v)
                                 for k, v in pc.scene_point_of_track.items()},
    }
    arrays = {
        "poses_R": np.stack([p.R for p in pg.poses]) if pg.poses else np.zeros((0, 3, 3)),
        "poses_t": np.stack([p.t for p in pg.poses]) if pg.poses else np.zeros((0, 3)),
        "points": pc.points,
        "colors": pc.colors,
        "meta": np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
    }
    if tr.edges_a:
        arrays["edges_a"] = np.concatenate(tr.edges_a)
        arrays["edges_b"] = np.concatenate(tr.edges_b)
    if tr.responses:
        arrays["responses"] = np.concatenate(tr.responses)
    np.savez_compressed(path, **arrays)


def load_sfm_state(path: str, pipeline):
    """Restore graph/map/tracker state saved by save_sfm_state."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["meta"]).decode())

    pg = pipeline.pose_graph
    pg.poses = []
    pg.edges = []
    pg._adj = {}
    for i in range(meta["num_poses"]):
        pg.add_absolute_pose(data["poses_R"][i], data["poses_t"][i],
                             meta["frame_indices"][i])

    pc = pipeline.point_cloud
    pc.points = data["points"]
    pc.colors = data["colors"]
    pc.scene_point_of_track = {int(k): v for k, v
                               in meta["scene_point_of_track"].items()}

    tr = pipeline.tracker
    tr.offsets = list(meta["tracker_offsets"])
    tr.counts = list(meta["tracker_counts"])
    tr._total = (tr.offsets[-1] + tr.counts[-1]) if tr.offsets else 0
    if "responses" in data:
        tr.responses = [data["responses"]]
    if "edges_a" in data:
        tr.edges_a = [data["edges_a"]]
        tr.edges_b = [data["edges_b"]]
    tr.compute_tracks()
    return pipeline
