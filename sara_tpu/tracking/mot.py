"""Multiple-object tracking: KF tracks + assignment + lifecycle.

Rebuild (and completion) of the reference's MOT scaffolding
(reference: cpp/src/DO/Sara/MultipleObjectTracking/*.hpp — the reference
ships noise models and a cosine re-ID distance but no tracker loop; this
module provides the full SORT-style tracker the scaffolding implies).
Cost = IoU (+ optional appearance cosine distance), optimal assignment via
scipy's Hungarian solver on host, KF predict/update batched on device.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

import jax.numpy as jnp

from sara_tpu.tracking.kalman import (
    GaussianState, constant_velocity_box_model, kf_predict, kf_update)


def iou_matrix(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """IoU between (N, 4) and (M, 4) boxes in (cx, cy, w, h)."""

    def to_xyxy(b):
        return np.stack([b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
                         b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2], axis=1)

    A = to_xyxy(np.asarray(boxes_a))
    B = to_xyxy(np.asarray(boxes_b))
    x1 = np.maximum(A[:, None, 0], B[None, :, 0])
    y1 = np.maximum(A[:, None, 1], B[None, :, 1])
    x2 = np.minimum(A[:, None, 2], B[None, :, 2])
    y2 = np.minimum(A[:, None, 3], B[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_a = (A[:, 2] - A[:, 0]) * (A[:, 3] - A[:, 1])
    area_b = (B[:, 2] - B[:, 0]) * (B[:, 3] - B[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / np.maximum(union, 1e-9)


def cosine_distance(feat_a: np.ndarray, feat_b: np.ndarray) -> np.ndarray:
    """Appearance re-ID distance (reference: MultipleObjectTracking cosine
    distance)."""
    a = feat_a / np.maximum(np.linalg.norm(feat_a, axis=1, keepdims=True), 1e-9)
    b = feat_b / np.maximum(np.linalg.norm(feat_b, axis=1, keepdims=True), 1e-9)
    return 1.0 - a @ b.T


@dataclass
class Track:
    track_id: int
    state: GaussianState
    hits: int = 1
    misses: int = 0
    age: int = 1
    feature: Optional[np.ndarray] = None


class MultiObjectTracker:
    def __init__(self, iou_threshold: float = 0.3, max_misses: int = 5,
                 min_hits: int = 3, dt: float = 1.0,
                 appearance_weight: float = 0.0):
        self.model = constant_velocity_box_model(dt=dt, q=1.0, r=1.0)
        self.iou_threshold = iou_threshold
        self.max_misses = max_misses
        self.min_hits = min_hits
        self.appearance_weight = appearance_weight
        self.tracks: List[Track] = []
        self._next_id = 0

    def _new_track(self, box, feature=None):
        x = jnp.asarray(np.concatenate([box, np.zeros(4)]), jnp.float32)
        P = jnp.eye(8) * 10.0
        t = Track(self._next_id, GaussianState(x, P), feature=feature)
        self._next_id += 1
        return t

    def step(self, boxes: np.ndarray, features: Optional[np.ndarray] = None):
        """One tracking step with (N, 4) detections (cx, cy, w, h).

        Returns list of (track_id, box) for confirmed tracks."""
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)

        # Predict all tracks.
        for t in self.tracks:
            t.state = kf_predict(t.state, self.model)
            t.age += 1

        # Associate.
        if self.tracks and len(boxes):
            pred = np.stack([np.asarray(t.state.x[:4]) for t in self.tracks])
            cost = 1.0 - iou_matrix(pred, boxes)
            if self.appearance_weight > 0 and features is not None:
                tf = np.stack([t.feature if t.feature is not None
                               else np.zeros(features.shape[1])
                               for t in self.tracks])
                cost = ((1 - self.appearance_weight) * cost
                        + self.appearance_weight * cosine_distance(tf, features))
            from scipy.optimize import linear_sum_assignment

            rows, cols = linear_sum_assignment(cost)
            matched_t, matched_d = set(), set()
            for r, c in zip(rows, cols):
                if 1.0 - cost[r, c] >= self.iou_threshold or (
                        self.appearance_weight > 0 and cost[r, c] < 0.5):
                    t = self.tracks[r]
                    t.state, _, _ = kf_update(t.state, self.model,
                                              jnp.asarray(boxes[c]))
                    t.hits += 1
                    t.misses = 0
                    if features is not None:
                        t.feature = features[c]
                    matched_t.add(r)
                    matched_d.add(c)
        else:
            matched_t, matched_d = set(), set()

        # Unmatched tracks age out; unmatched detections spawn tracks.
        for i, t in enumerate(self.tracks):
            if i not in matched_t:
                t.misses += 1
        self.tracks = [t for t in self.tracks if t.misses <= self.max_misses]
        for c in range(len(boxes)):
            if c not in matched_d:
                self.tracks.append(self._new_track(
                    boxes[c], features[c] if features is not None else None))

        return [(t.track_id, np.asarray(t.state.x[:4]))
                for t in self.tracks if t.hits >= self.min_hits]
