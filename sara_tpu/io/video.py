"""Video decode/encode.

Rebuild of the reference's VideoIO layer
(reference: cpp/src/DO/Sara/VideoIO/VideoStream.hpp:19-76 — FFmpeg decode
with rotation metadata and frame skipping, VideoWriter.hpp; plus the frame
skipper SfM/Odometry/VideoStreamer.hpp:11-69). We use OpenCV's VideoCapture
(FFmpeg-backed in this image) for the same capability set.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np


class VideoStream:
    """Iterate video frames as RGB uint8 arrays, with frame skipping."""

    def __init__(self, path: str, num_skips: int = 0):
        import cv2

        self._cap = cv2.VideoCapture(path)
        if not self._cap.isOpened():
            raise IOError(f"cannot open video: {path}")
        self.num_skips = num_skips
        self.frame_index = -1

    @property
    def sizes(self):
        import cv2

        h = int(self._cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        w = int(self._cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        return h, w

    @property
    def fps(self) -> float:
        import cv2

        return float(self._cap.get(cv2.CAP_PROP_FPS))

    def read(self) -> Optional[np.ndarray]:
        """Next (non-skipped) frame as RGB, or None at end of stream
        (reference: VideoStreamer::read with num_frames_to_skip)."""
        import cv2

        for _ in range(self.num_skips + 1):
            ok, frame = self._cap.read()
            if not ok:
                return None
            self.frame_index += 1
        return cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            f = self.read()
            if f is None:
                return
            yield f

    def close(self):
        self._cap.release()


class VideoWriter:
    def __init__(self, path: str, sizes, fps: float = 30.0):
        import cv2

        h, w = sizes
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        self._w = cv2.VideoWriter(path, fourcc, fps, (w, h))

    def write(self, frame_rgb: np.ndarray):
        import cv2

        self._w.write(cv2.cvtColor(np.asarray(frame_rgb), cv2.COLOR_RGB2BGR))

    def close(self):
        self._w.release()
