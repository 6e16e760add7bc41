"""Point cloud bookkeeping: track -> scene point mapping, growth, export.

Host-side rebuild of the reference's PointCloudGenerator
(reference: cpp/src/DO/Sara/SfM/BuildingBlocks/PointCloudGenerator.hpp:25-173,
.cpp:190-507 — scene-point index propagation across merged tracks,
barycentric compression, growth by triangulation with cheirality +
distance_max filtering, color sampling, PLY export). Triangulation itself
runs on device (sara_tpu.mvg.triangulate_linear); this module owns the
mutable map state.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

DISTANCE_MAX = 1e3  # reference: PointCloudGenerator.cpp distance_max


class PointCloudGenerator:
    def __init__(self):
        self.points = np.zeros((0, 3))
        self.colors = np.zeros((0, 3))
        self.scene_point_of_track: Dict[int, int] = {}

    @property
    def num_points(self) -> int:
        return len(self.points)

    def track_has_point(self, track_id: int) -> bool:
        return track_id in self.scene_point_of_track

    def point_of_track(self, track_id: int) -> Optional[np.ndarray]:
        i = self.scene_point_of_track.get(track_id)
        return self.points[i] if i is not None else None

    def add_points(self, track_ids, xyz: np.ndarray,
                   colors: Optional[np.ndarray] = None):
        """Assign new scene points to (trackless) tracks, filtering
        non-finite / too-distant points (reference: grow_point_cloud,
        PointCloudGenerator.cpp:289-427)."""
        xyz = np.asarray(xyz, float)
        ok = np.isfinite(xyz).all(axis=1) & (np.linalg.norm(xyz, axis=1) < DISTANCE_MAX)
        if colors is None:
            colors = np.full_like(xyz, 0.5)
        base = len(self.points)
        kept = 0
        new_pts = []
        new_cols = []
        for ti, good, p, c in zip(track_ids, ok, xyz, colors):
            ti = int(ti)
            if not good or ti in self.scene_point_of_track:
                continue
            self.scene_point_of_track[ti] = base + kept
            new_pts.append(p)
            new_cols.append(c)
            kept += 1
        if kept:
            self.points = np.concatenate([self.points, np.asarray(new_pts)])
            self.colors = np.concatenate([self.colors, np.asarray(new_cols)])
        return kept

    def update_points(self, track_ids, xyz: np.ndarray):
        """Overwrite positions of existing tracks' scene points (e.g. after
        bundle adjustment)."""
        for ti, p in zip(track_ids, np.asarray(xyz, float)):
            i = self.scene_point_of_track.get(int(ti))
            if i is not None and np.isfinite(p).all():
                self.points[i] = p

    def compress(self, live_track_ids):
        """Drop scene points whose tracks are gone; re-index densely
        (reference: compress_point_cloud, PointCloudGenerator.cpp:246-287)."""
        live = set(int(t) for t in live_track_ids)
        keep = [(t, i) for t, i in self.scene_point_of_track.items() if t in live]
        idx = np.asarray([i for _, i in keep], int)
        self.points = self.points[idx] if len(idx) else np.zeros((0, 3))
        self.colors = self.colors[idx] if len(idx) else np.zeros((0, 3))
        self.scene_point_of_track = {t: k for k, (t, _) in enumerate(keep)}

    def write_ply(self, path: str):
        """ASCII PLY export (reference: PointCloudGenerator.cpp:447-507)."""
        write_ply(path, self.points, self.colors)


def write_ply(path: str, points, colors=None):
    """ASCII PLY export of an (N, 3) point array with optional (N, 3)
    colors in [0, 1] (reference: PointCloudGenerator.cpp:447-507)."""
    points = np.asarray(points, float)
    colors = (np.full_like(points, 0.7) if colors is None
              else np.asarray(colors, float))
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(points)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for p, c in zip(points, colors):
            r, g, b = (np.clip(c, 0, 1) * 255).astype(int)
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {r} {g} {b}\n")
