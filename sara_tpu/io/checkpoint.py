"""Checkpoint / resume of the incremental SfM state.

The reference has no checkpointing (SURVEY.md §5); long sequences must be
resumable in this framework. The pose graph (+ relative-pose edges), map,
tracker state, per-frame host keypoint copies and the last accepted frame's
full keypoints (descriptors included — the next frame matches against them)
are serialized as one compressed NPZ, so a restored pipeline can process the
next frame exactly as an uninterrupted run would.
"""

from __future__ import annotations

import json

import numpy as np


def save_sfm_state(path: str, pipeline):
    """Serialize an OdometryPipeline's full resumable state."""
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
        "frames_since_ba": int(getattr(pipeline, "_frames_since_ba", 0)),
        "frame_tracker_ids": [f["tracker_id"] for f in pipeline.frames],
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
    # Relative-pose edges (graph topology for pose-graph opt/loop closure).
    E = pg.edges
    arrays["edge_src"] = np.asarray([e.src for e in E], np.int64)
    arrays["edge_dst"] = np.asarray([e.dst for e in E], np.int64)
    arrays["edge_R"] = (np.stack([e.R for e in E]) if E
                        else np.zeros((0, 3, 3)))
    arrays["edge_t"] = np.stack([e.t for e in E]) if E else np.zeros((0, 3))
    arrays["edge_nm"] = np.asarray([e.num_matches for e in E], np.int64)
    arrays["edge_ni"] = np.asarray([e.num_inliers for e in E], np.int64)
    # Per-frame host keypoint copies (concatenated; split by tracker_counts
    # on load — add_frame registers exactly kp.capacity rows per frame).
    fr = pipeline.frames
    if fr:
        for name in ("xy", "scale", "response", "mask"):
            arrays["frames_" + name] = np.concatenate(
                [f["kp"][name] for f in fr], axis=0)
    # Last accepted frame's full keypoints (the matching target of the next
    # frame) + PRNG state: what load_sfm_state needs to resume processing.
    kp = pipeline._prev_keypoints
    if kp is not None:
        for name in ("xy", "scale", "orientation", "response",
                     "descriptors", "mask"):
            arrays["prev_kp_" + name] = np.asarray(getattr(kp, name))
    arrays["prng_key"] = np.asarray(pipeline._key)
    np.savez_compressed(path, **arrays)


def load_sfm_state(path: str, pipeline):
    """Restore a pipeline saved by save_sfm_state into a RESUMABLE state:
    the returned pipeline's next process_frame/process_keypoints call
    behaves exactly as the uninterrupted run's would."""
    import jax.numpy as jnp

    from sara_tpu.core.types import Keypoints

    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["meta"]).decode())

    pg = pipeline.pose_graph
    pg.poses = []
    pg.edges = []
    pg._adj = {}
    for i in range(meta["num_poses"]):
        pg.add_absolute_pose(data["poses_R"][i], data["poses_t"][i],
                             meta["frame_indices"][i])
    if "edge_src" in data:
        for k in range(len(data["edge_src"])):
            pg.add_relative_pose(int(data["edge_src"][k]),
                                 int(data["edge_dst"][k]),
                                 data["edge_R"][k], data["edge_t"][k],
                                 int(data["edge_nm"][k]),
                                 int(data["edge_ni"][k]))

    pc = pipeline.point_cloud
    pc.points = data["points"]
    pc.colors = data["colors"]
    pc.scene_point_of_track = {int(k): v for k, v
                               in meta["scene_point_of_track"].items()}

    tr = pipeline.tracker
    tr.offsets = list(meta["tracker_offsets"])
    tr.counts = list(meta["tracker_counts"])
    tr._total = (tr.offsets[-1] + tr.counts[-1]) if tr.offsets else 0
    # The persistent union-find / native tracker core may hold unions from
    # whatever this pipeline object did before the load — rebuild from the
    # loaded state.
    tr._uf = None
    tr._uf_edges_done = 0
    tr._tk = None
    if "responses" in data:
        # Split back into one batch per frame (the incremental core keys
        # features to frames by responses-batch position).
        resp = data["responses"]
        tr.responses = [resp[o:o + c] for o, c in zip(tr.offsets, tr.counts)]
    else:
        tr.responses = []
    if "edges_a" in data:
        tr.edges_a = [data["edges_a"]]
        tr.edges_b = [data["edges_b"]]
    else:
        tr.edges_a, tr.edges_b = [], []
    tr.compute_tracks()

    # Per-frame host keypoint copies.
    pipeline.frames = []
    if "frames_xy" in data:
        tids = meta.get("frame_tracker_ids",
                        list(range(len(meta["tracker_counts"]))))
        lo = 0
        for i, n in enumerate(meta["tracker_counts"]):
            kp_host = {name: data["frames_" + name][lo:lo + n]
                       for name in ("xy", "scale", "response", "mask")}
            pipeline.frames.append({"kp": kp_host, "tracker_id": tids[i],
                                    "image": None})
            lo += n

    if "prev_kp_xy" in data:
        pipeline._prev_keypoints = Keypoints(
            xy=jnp.asarray(data["prev_kp_xy"]),
            scale=jnp.asarray(data["prev_kp_scale"]),
            orientation=jnp.asarray(data["prev_kp_orientation"]),
            response=jnp.asarray(data["prev_kp_response"]),
            descriptors=jnp.asarray(data["prev_kp_descriptors"]),
            mask=jnp.asarray(data["prev_kp_mask"]))
    else:
        pipeline._prev_keypoints = None
    if "prng_key" in data:
        pipeline._key = jnp.asarray(data["prng_key"])
    pipeline._frames_since_ba = meta.get("frames_since_ba", 0)
    pipeline._pending_image = None
    return pipeline
