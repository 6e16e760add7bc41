"""Camera calibration: chessboard detection + intrinsics estimation.

TPU-native rebuild of the reference calibration stack
(reference: cpp/src/DO/Sara/ChessboardDetection/,
cpp/tools/Calibration/calibrate_pinhole_camera.cpp:36-384).
"""

from sara_tpu.calib.calibrate import (
    zhang_init_intrinsics, homography_pose, calibrate_pinhole,
    calibrate_omnidirectional)
from sara_tpu.calib.chessboard import detect_chessboard_corners, ChessboardParams

__all__ = [
    "zhang_init_intrinsics", "homography_pose", "calibrate_pinhole",
    "calibrate_omnidirectional",
    "detect_chessboard_corners", "ChessboardParams",
]
