"""Fixed-capacity keypoint / match containers (pytrees).

TPU-native replacement for the reference's dynamic containers:
``OERegion`` + ``KeypointList`` (reference: cpp/src/DO/Sara/Features/Feature.hpp:40,
Features/KeypointList.hpp:36) and ``Match`` (Match/Match.hpp).

Everything is a NamedTuple of arrays with a leading capacity dimension and a
boolean validity ``mask`` — the capacity is static so every consumer stays
jittable; the actual count is ``mask.sum()``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Keypoints(NamedTuple):
    """A fixed-capacity set of oriented scale-space keypoints.

    Mirrors the information content of the reference's ``OERegion``
    (center, shape matrix = scale, orientation, extremum value/type) plus the
    descriptor matrix of ``KeypointList`` — as one struct-of-arrays pytree.

    Attributes:
      xy:          (N, 2) float32 — (x, y) pixel position at full image scale.
      scale:       (N,)  float32 — characteristic scale sigma (pixels).
      orientation: (N,)  float32 — dominant orientation in radians.
      response:    (N,)  float32 — extremum value (DoG response, cornerness...).
      descriptors: (N, D) float32 — descriptor rows (D=128 for SIFT); may be
                   zeros if description was not run.
      mask:        (N,)  bool — True for valid rows.
    """

    xy: jnp.ndarray
    scale: jnp.ndarray
    orientation: jnp.ndarray
    response: jnp.ndarray
    descriptors: jnp.ndarray
    mask: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32))

    @staticmethod
    def empty(capacity: int, descriptor_dim: int = 128) -> "Keypoints":
        return Keypoints(
            xy=jnp.zeros((capacity, 2), jnp.float32),
            scale=jnp.zeros((capacity,), jnp.float32),
            orientation=jnp.zeros((capacity,), jnp.float32),
            response=jnp.zeros((capacity,), jnp.float32),
            descriptors=jnp.zeros((capacity, descriptor_dim), jnp.float32),
            mask=jnp.zeros((capacity,), bool),
        )


class Matches(NamedTuple):
    """Fixed-capacity descriptor matches between two keypoint sets.

    Mirrors the reference ``Match`` record (indices + score); padded rows have
    ``mask == False``.

    Attributes:
      i:     (M,) int32 — index into the source keypoint set.
      j:     (M,) int32 — index into the target keypoint set.
      score: (M,) float32 — match score (squared descriptor distance).
      mask:  (M,) bool.
    """

    i: jnp.ndarray
    j: jnp.ndarray
    score: jnp.ndarray
    mask: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.i.shape[0]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32))


def concat_keypoints(a: Keypoints, b: Keypoints) -> Keypoints:
    """Concatenate two keypoint sets (capacity adds; masks preserved)."""
    return Keypoints(*(jnp.concatenate([fa, fb], axis=0) for fa, fb in zip(a, b)))


def take_keypoints(k: Keypoints, idx: jnp.ndarray, valid: jnp.ndarray) -> Keypoints:
    """Gather rows ``idx`` from ``k``; rows where ``valid`` is False are masked."""
    return Keypoints(
        xy=k.xy[idx],
        scale=k.scale[idx],
        orientation=k.orientation[idx],
        response=k.response[idx],
        descriptors=k.descriptors[idx],
        mask=k.mask[idx] & valid,
    )
