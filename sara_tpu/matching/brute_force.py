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
    """(Na, D) x (Nb, D) -> (Na, Nb) squared L2 distances via GEMM.

    On TPU the cross term runs as a bfloat16 MXU matmul with float32
    accumulation: SIFT descriptors are unit-norm with 0.2-clamped entries,
    so the ~3e-3 relative error is far below the 0.8 ratio-test margin,
    and the GEMM is the matcher's dominant cost.
    """
    na = jnp.sum(da * da, axis=-1, keepdims=True)
    nb = jnp.sum(db * db, axis=-1, keepdims=True)
    if jax.default_backend() == "tpu":
        cross = jax.lax.dot(da.astype(jnp.bfloat16),
                            db.astype(jnp.bfloat16).T,
                            preferred_element_type=jnp.float32)
    else:
        cross = da @ db.T
    d2 = na + nb.T - 2.0 * cross
    return jnp.maximum(d2, 0.0)


def _top2_min(d2: jnp.ndarray):
    """Row-wise (best, second-best, argbest) without lax.top_k.

    Two min/argmin passes are far cheaper on TPU than a width-2 top_k over
    wide rows (top_k lowers to an iterative sort network).
    """
    j = jnp.argmin(d2, axis=1)
    d1 = jnp.take_along_axis(d2, j[:, None], axis=1)[:, 0]
    masked = d2.at[jnp.arange(d2.shape[0]), j].set(jnp.inf)
    d2nd = jnp.min(masked, axis=1)
    return d1, d2nd, j


@functools.partial(jax.jit, static_argnames=("params",))
def match_descriptors(a: Keypoints, b: Keypoints,
                      params: MatchParams = MatchParams()) -> Matches:
    """Match keypoint sets a -> b. Output capacity = a.capacity."""
    d2 = _pairwise_sqdist(a.descriptors, b.descriptors)
    big = jnp.asarray(jnp.inf, d2.dtype)
    d2 = jnp.where(a.mask[:, None] & b.mask[None, :], d2, big)

    # Top-2 nearest neighbors per row via two min passes (top_k is slow on
    # TPU for wide rows).
    d1, d2nd, j = _top2_min(d2)

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
