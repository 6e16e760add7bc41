"""Multi-view geometry: minimal solvers, two-view geometry, normalization.

TPU-native rebuild of the reference's ``DO/Sara/MultiViewGeometry`` layer —
every solver is a batched closed-form program designed to run under ``vmap``
over RANSAC hypothesis batches.
"""

from sara_tpu.mvg.normalizer import hartley_normalize, normalize_points
from sara_tpu.mvg.solvers import (
    eight_point_fundamental,
    seven_point_fundamental,
    four_point_homography,
)
from sara_tpu.mvg.two_view import (
    essential_to_motions,
    triangulate_linear,
    sampson_epipolar_distance,
    symmetric_epipolar_distance,
    symmetric_transfer_error,
    two_view_geometry,
)
from sara_tpu.mvg.fivepoint import five_point_essential
from sara_tpu.mvg.degeneracy import (dominant_plane_ratio,
                                     homography_from_epipolar)
from sara_tpu.mvg.p3p import p3p_lambda_twist

__all__ = [
    "hartley_normalize", "normalize_points",
    "eight_point_fundamental", "seven_point_fundamental", "four_point_homography",
    "essential_to_motions", "triangulate_linear",
    "sampson_epipolar_distance", "symmetric_epipolar_distance",
    "symmetric_transfer_error", "two_view_geometry",
    "dominant_plane_ratio", "homography_from_epipolar",
    "five_point_essential", "p3p_lambda_twist",
]
