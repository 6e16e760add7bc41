"""Brute-force descriptor matching: blocked GEMM + Lowe ratio test.

TPU-native replacement for the reference's FLANN KD-tree matcher
(reference: cpp/src/DO/Sara/FeatureMatching/AnnMatcher.cpp:58-282 — kNN(3)
with ratio test on squared distances, both directions, dedup). On TPU the
idiomatic choice is exact matching on the MXU:

    ||a - b||^2 = ||a||^2 + ||b||^2 - 2 a.b

computed as one (capacity x capacity) matmul, top-2 per row/column, ratio
test, and a mutual-consistency intersection that subsumes the reference's
bidirectional dedup. Masked (padded) keypoints get +inf distance.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from sara_tpu.core.types import Keypoints, Matches


@dataclass(frozen=True)
class MatchParams:
    """Static matcher knobs.

    ratio: Lowe ratio on *distances* (the SfM pipeline uses 0.8; reference
      SfM/Helpers/KeypointMatching.cpp:19-25, FeatureParams.hpp:11).
    mutual: require best-match consistency in both directions (subsumes the
      reference's source->target + target->source dedup).
    """

    ratio: float = 0.8
    mutual: bool = True


def _pairwise_sqdist(da: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """(Na, D) x (Nb, D) -> (Na, Nb) squared L2 distances via GEMM."""
    na = jnp.sum(da * da, axis=-1, keepdims=True)
    nb = jnp.sum(db * db, axis=-1, keepdims=True)
    cross = da @ db.T
    d2 = na + nb.T - 2.0 * cross
    return jnp.maximum(d2, 0.0)


@functools.partial(jax.jit, static_argnames=("params",))
def match_descriptors(a: Keypoints, b: Keypoints,
                      params: MatchParams = MatchParams()) -> Matches:
    """Match keypoint sets a -> b. Output capacity = a.capacity."""
    d2 = _pairwise_sqdist(a.descriptors, b.descriptors)
    big = jnp.asarray(jnp.inf, d2.dtype)
    d2 = jnp.where(a.mask[:, None] & b.mask[None, :], d2, big)

    # Top-2 nearest neighbors per row (negate for top_k = smallest).
    neg, idx = jax.lax.top_k(-d2, 2)
    d1, d2nd = -neg[:, 0], -neg[:, 1]
    j = idx[:, 0]

    # Lowe ratio on squared distances: d1 < (ratio^2) * d2nd
    ok = d1 < (params.ratio ** 2) * d2nd
    ok = ok & a.mask & jnp.isfinite(d1)

    if params.mutual:
        # Best match per column.
        jT = jnp.argmin(d2, axis=0)  # for each b-index, best a-index
        ok = ok & (jT[j] == jnp.arange(a.capacity))

    return Matches(
        i=jnp.arange(a.capacity, dtype=jnp.int32),
        j=j.astype(jnp.int32),
        score=d1,
        mask=ok,
    )
