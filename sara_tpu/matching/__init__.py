"""Descriptor matching."""

from sara_tpu.matching.brute_force import match_descriptors, MatchParams

__all__ = ["match_descriptors", "MatchParams"]
