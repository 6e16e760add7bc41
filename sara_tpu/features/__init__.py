"""Feature detection & description.

TPU-native rebuild of the reference's FeatureDetectors / FeatureDescriptors
layers: DoG/Harris/Hessian/LoG detectors, dominant-orientation assignment and
SIFT description — all as fixed-capacity, masked, vmapped device programs.
"""

from sara_tpu.features.dog import DoGParams, detect_dog_octave
from sara_tpu.features.orientation import dominant_orientations
from sara_tpu.features.sift import sift_descriptors
from sara_tpu.features.api import SIFTParams, compute_sift_keypoints

__all__ = [
    "DoGParams", "detect_dog_octave",
    "dominant_orientations", "sift_descriptors",
    "SIFTParams", "compute_sift_keypoints",
]
