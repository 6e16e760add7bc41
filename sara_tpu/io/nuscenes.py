"""nuScenes / nuImages JSON metadata loaders.

Rebuild of the reference's loaders
(reference: cpp/src/DO/Sara/Datasets/NuScenes/NuScenes.hpp, NuImages.hpp —
nlohmann-json table readers with token cross-references).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List


class NuScenesTables:
    """Lazy loader of the nuScenes relational tables (sample, sample_data,
    ego_pose, calibrated_sensor, sensor, scene)."""

    TABLES = ["scene", "sample", "sample_data", "ego_pose",
              "calibrated_sensor", "sensor"]

    def __init__(self, dataroot: str, version: str = "v1.0-mini"):
        self.dataroot = dataroot
        self.version = version
        self._tables: Dict[str, List[dict]] = {}
        self._by_token: Dict[str, Dict[str, dict]] = {}

    def table(self, name: str) -> List[dict]:
        if name not in self._tables:
            path = os.path.join(self.dataroot, self.version, f"{name}.json")
            with open(path) as f:
                self._tables[name] = json.load(f)
            self._by_token[name] = {r["token"]: r for r in self._tables[name]}
        return self._tables[name]

    def get(self, name: str, token: str) -> dict:
        self.table(name)
        return self._by_token[name][token]

    def camera_frames(self, channel: str = "CAM_FRONT") -> List[dict]:
        """All sample_data records of a camera channel, with calibration and
        ego pose joined in."""
        out = []
        for sd in self.table("sample_data"):
            cs = self.get("calibrated_sensor", sd["calibrated_sensor_token"])
            sensor = self.get("sensor", cs["sensor_token"])
            if sensor["channel"] != channel:
                continue
            rec = dict(sd)
            rec["camera_intrinsic"] = cs.get("camera_intrinsic")
            rec["sensor_rotation"] = cs.get("rotation")
            rec["sensor_translation"] = cs.get("translation")
            rec["ego_pose"] = self.get("ego_pose", sd["ego_pose_token"])
            out.append(rec)
        out.sort(key=lambda r: r["timestamp"])
        return out
