"""Batched RANSAC: all hypotheses evaluated as one device program.

TPU-native rebuild of the reference's generic RANSAC
(reference: cpp/src/DO/Sara/RANSAC/RANSACv2.hpp:26-122, RANSAC.hpp:79-205).
The reference already pre-draws all minimal samples then loops; on TPU the
loop becomes a ``vmap`` over the hypothesis batch and the adaptive early
exit becomes a fixed batch + argmax — same estimator, one XLA program
(design per SURVEY.md §3.3).

The engine is generic over (solver, residual) callables:
  solver(sample_pytree) -> (models (M, ...), model_valid (M,))
  residual(model, data_pytree) -> (N,) residuals
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class RansacResult(NamedTuple):
    model: jnp.ndarray     # best model parameters
    inliers: jnp.ndarray   # (N,) bool inlier mask (includes data mask)
    num_inliers: jnp.ndarray  # scalar int32
    success: jnp.ndarray   # scalar bool


def ransac_num_samples(inlier_ratio: float, sample_size: int,
                       confidence: float = 0.99) -> int:
    """Classic adaptive sample count (host-side helper; the device program
    uses a fixed batch) (reference: RANSAC.hpp:184)."""
    inlier_ratio = min(max(inlier_ratio, 1e-8), 1 - 1e-12)
    p_good = inlier_ratio ** sample_size
    return int(math.ceil(math.log(1 - confidence) / math.log(1 - p_good + 1e-300)))


def draw_samples(key, num_samples: int, sample_size: int, mask: jnp.ndarray):
    """(S, k) random indices over valid data rows (with replacement; samples
    containing duplicates are flagged invalid — the TPU-friendly equivalent
    of the reference's random_samples, Core/Random.hpp:53)."""
    n = mask.shape[0]
    probs = mask.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    idx = jax.random.choice(key, n, shape=(num_samples, sample_size), p=probs)
    # Flag samples with repeated indices.
    eq = idx[:, :, None] == idx[:, None, :]
    dup = jnp.sum(eq.astype(jnp.int32), axis=(1, 2)) > sample_size
    return idx, ~dup


def ransac(
    key,
    data,
    data_mask: jnp.ndarray,
    solver: Callable,
    residual: Callable,
    sample_size: int,
    num_samples: int,
    threshold: float,
    min_inliers: int = 0,
) -> RansacResult:
    """Run batched RANSAC.

    Args:
      key: PRNG key.
      data: pytree whose leaves have leading dim N (correspondences).
      data_mask: (N,) validity of data rows.
      solver: minimal solver over a sample pytree (leaves lead dim =
        sample_size) -> (models, model_valid).
      residual: (model, data) -> (N,) residuals (same units as threshold).
      sample_size, num_samples: static ints.
      threshold: inlier threshold.
      min_inliers: success requires at least this many inliers.
    """
    idx, sample_ok = draw_samples(key, num_samples, sample_size, data_mask)
    take = lambda a: a[idx]  # (S, k, ...)
    samples = jax.tree_util.tree_map(take, data)

    models, model_valid = jax.vmap(solver)(samples)  # (S, M, ...), (S, M)
    model_valid = model_valid & sample_ok[:, None]

    # Flatten hypothesis batch.
    S, M = model_valid.shape
    flat_models = jax.tree_util.tree_map(
        lambda a: a.reshape((S * M,) + a.shape[2:]), models)
    flat_valid = model_valid.reshape(-1)

    def score(model, valid):
        r = residual(model, data)
        inl = (r < threshold) & data_mask
        count = jnp.where(valid, jnp.sum(inl.astype(jnp.int32)), -1)
        return count

    counts = jax.vmap(score)(flat_models, flat_valid)
    best = jnp.argmax(counts)
    best_model = jax.tree_util.tree_map(lambda a: a[best], flat_models)
    r = residual(best_model, data)
    inliers = (r < threshold) & data_mask
    n_inl = jnp.sum(inliers.astype(jnp.int32))
    success = (counts[best] > 0) & (n_inl >= min_inliers)
    return RansacResult(best_model, inliers, n_inl, success)
