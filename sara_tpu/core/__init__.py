"""Core typed containers and math for sara-tpu.

Replaces the reference's ``DO/Sara/Core`` layer (Image/MultiArray/Tensor,
Pixel, Math) with JAX-native equivalents: plain ``jnp`` arrays for images,
NamedTuple pytrees for keypoint/match sets, and pure-function math modules.
"""

from sara_tpu.core.types import Keypoints, Matches, concat_keypoints
from sara_tpu.core import lie
from sara_tpu.core import cameras
from sara_tpu.core import poly

__all__ = ["Keypoints", "Matches", "concat_keypoints", "lie", "cameras", "poly"]
