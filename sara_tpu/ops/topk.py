"""Bucketed approximate top-k for sparse score maps.

``jax.lax.top_k`` over a full response map (10^6+ elements) lowers to an
expensive sort on TPU. Detector candidates are spatially sparse after
non-max suppression, so a two-stage reduction is ~exact in practice and far
cheaper: reduce each of B buckets to its (max, argmax), then run the exact
top-k over the B bucket maxima. At most one candidate per bucket survives;
with B >= 8 * k collisions only drop the weakest duplicates (and only when
two survivors share a bucket).

This is the TPU analog of the reference GPU stream compaction
(reference: cpp/src/DO/Shakti/Halide/Generators/StreamCompactionGenerator.cpp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


MAX_TOPK_CHUNK = 1024  # largest k handed to a single lax.top_k call: the
                       # TPU runtime reproducibly kernel-faults on large-k
                       # sorts (k=3072/6144 in the fo=-1 SIFT program,
                       # NOTES.md round 2); k<=1024 passes are safe.


def chunked_top_k(score: jnp.ndarray, k: int,
                  chunk: int = MAX_TOPK_CHUNK):
    """Exact top-k of a flat vector using only k<=chunk ``lax.top_k`` calls.

    Extracts ``chunk`` winners per pass and masks them to -inf before the
    next pass — ceil(k/chunk) small-k sorts instead of one large-k sort.
    Returns (values (k,), indices (k,)) exactly like ``lax.top_k``.
    """
    n = score.shape[0]
    k = min(k, n)
    if k <= chunk:
        return jax.lax.top_k(score, k)
    vals, idxs = [], []
    s = score
    remaining = k
    while remaining > 0:
        kc = min(chunk, remaining)
        v, i = jax.lax.top_k(s, kc)
        vals.append(v)
        idxs.append(i)
        remaining -= kc
        if remaining > 0:
            s = s.at[i].set(-jnp.inf)
    return jnp.concatenate(vals), jnp.concatenate(idxs)


def bucketed_top_k(score: jnp.ndarray, k: int, num_buckets: int | None = None):
    """Approximate top-k over a flat score vector.

    Args:
      score: (N,) float scores (use -inf for invalid entries).
      k: number of results (static).
      num_buckets: static bucket count (default: max(8k, 4096) clamped to N).

    Returns (values (k,), indices (k,)) — like lax.top_k, approximately.
    """
    n = score.shape[0]
    if num_buckets is None:
        num_buckets = max(8 * k, 4096)
    if n <= max(4 * k, 16384) or num_buckets >= n:
        return chunked_top_k(score, min(k, n))

    b = num_buckets
    per = -(-n // b)  # ceil
    pad = b * per - n
    s = jnp.concatenate([score, jnp.full((pad,), -jnp.inf, score.dtype)])
    s = s.reshape(b, per)
    bucket_max = jnp.max(s, axis=1)
    bucket_arg = jnp.argmax(s, axis=1)
    vals, bidx = chunked_top_k(bucket_max, k)
    idx = bidx * per + bucket_arg[bidx]
    idx = jnp.minimum(idx, n - 1)
    return vals, idx.astype(jnp.int32)
