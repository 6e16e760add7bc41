"""Descriptor matching."""

from sara_tpu.matching.brute_force import match_descriptors, MatchParams
from sara_tpu.matching.propagation import (
    PropagationParams,
    match_consistency_matrix,
    propagate_matches,
)

__all__ = [
    "match_descriptors",
    "MatchParams",
    "PropagationParams",
    "match_consistency_matrix",
    "propagate_matches",
]
