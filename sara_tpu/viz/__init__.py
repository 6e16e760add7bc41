"""Visualization (matplotlib-based).

Rebuild of the reference's drawing APIs with a headless-friendly backend:
feature/match overlays (reference: cpp/src/DO/Sara/Visualization/Match/
Draw.hpp:40-44, Features/Draw.hpp) and 3-D point-cloud / trajectory views
(reference: cpp/src/DO/Kalpana/EasyGL point-cloud scenes). Qt/OpenGL
interactive windows are out of scope for a TPU server environment; figures
render to files or notebook canvases instead.
"""

from sara_tpu.viz.draw import (
    draw_keypoints, draw_matches, draw_point_cloud, draw_trajectory)

__all__ = ["draw_keypoints", "draw_matches", "draw_point_cloud",
           "draw_trajectory"]
