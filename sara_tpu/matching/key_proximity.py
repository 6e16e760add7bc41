"""Self-matching with spatial exclusion (KeyProximity).

Rebuild of the reference's repeated-structure matcher
(reference: cpp/src/DO/Sara/FeatureMatching/KeyProximity.hpp + AnnMatcher
self-matching mode): match a keypoint set against itself while excluding
neighbors that are spatially close or overlapping in scale-space — finds
repeated structure within one image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sara_tpu.core.types import Keypoints, Matches


@functools.partial(jax.jit, static_argnames=("ratio",))
def self_match(kp: Keypoints, min_pixel_dist: float = 10.0,
               scale_ratio_max: float = 2.0, ratio: float = 0.8) -> Matches:
    """Match kp against itself, excluding spatial neighbors."""
    d = kp.descriptors
    na = jnp.sum(d * d, axis=-1, keepdims=True)
    d2 = jnp.maximum(na + na.T - 2.0 * d @ d.T, 0.0)

    # Exclusion: same index, spatial proximity, or similar position in
    # scale space (reference KeyProximity uses both pixel and scale gates).
    pix = jnp.linalg.norm(kp.xy[:, None] - kp.xy[None], axis=-1)
    sr = kp.scale[:, None] / jnp.maximum(kp.scale[None], 1e-9)
    sr = jnp.maximum(sr, 1.0 / jnp.maximum(sr, 1e-9))
    near = (pix < min_pixel_dist) & (sr < scale_ratio_max)
    eye = jnp.eye(kp.capacity, dtype=bool)
    invalid = near | eye | ~(kp.mask[:, None] & kp.mask[None])
    d2 = jnp.where(invalid, jnp.inf, d2)

    neg, idx = jax.lax.top_k(-d2, 2)
    d1, d2nd = -neg[:, 0], -neg[:, 1]
    j = idx[:, 0]
    ok = (d1 < ratio * ratio * d2nd) & kp.mask & jnp.isfinite(d1)
    return Matches(i=jnp.arange(kp.capacity, dtype=jnp.int32),
                   j=j.astype(jnp.int32), score=d1, mask=ok)
