"""A-contrario RANSAC (ORSA / NFA-based model selection).

TPU-native rebuild of the reference's a-contrario estimator
(reference: cpp/src/DO/Sara/RANSAC/ORSA.hpp:53, AContrario.hpp): instead of
a fixed inlier threshold, each hypothesis selects the inlier count k that
minimizes the Number of False Alarms

    NFA(model, k) = N_models * C(n, k) * C(k, s) * alpha_k^(k - s)

where alpha_k is the probability that a random correspondence has residual
below the k-th smallest one. Fully batched: residuals are sorted per
hypothesis and the NFA is evaluated for every k as one vectorized program.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from sara_tpu.ransac.engine import draw_samples


class OrsaResult(NamedTuple):
    model: jnp.ndarray
    inliers: jnp.ndarray
    num_inliers: jnp.ndarray
    log_nfa: jnp.ndarray
    success: jnp.ndarray


def _log_comb(n, k):
    """log C(n, k) via lgamma, elementwise."""
    return (jax.lax.lgamma(n + 1.0) - jax.lax.lgamma(k + 1.0)
            - jax.lax.lgamma(n - k + 1.0))


def orsa(key, data, data_mask, solver: Callable, residual: Callable,
         sample_size: int, num_samples: int,
         alpha0: float, max_threshold: float,
         log_nfa_max: float = 0.0) -> OrsaResult:
    """A-contrario robust estimation.

    Args:
      alpha0: probability that a random point falls within residual 1 of the
        model (geometry-dependent normalization, e.g. 2/area for epipolar
        bands of unit half-width).
      max_threshold: residuals above this never count as inliers.
      log_nfa_max: accept only models with log10(NFA) below this.
    """
    n = data_mask.shape[0]
    idx, sample_ok = draw_samples(key, num_samples, sample_size, data_mask)
    take = lambda a: a[idx]
    samples = jax.tree_util.tree_map(take, data)
    models, model_valid = jax.vmap(solver)(samples)
    model_valid = model_valid & sample_ok[:, None]

    S, M = model_valid.shape
    flat_models = jax.tree_util.tree_map(
        lambda a: a.reshape((S * M,) + a.shape[2:]), models)
    flat_valid = model_valid.reshape(-1)

    n_f = jnp.asarray(float(n))
    s_f = float(sample_size)
    ks = jnp.arange(1, n + 1, dtype=jnp.float32)        # candidate k
    log_models = jnp.log10(jnp.asarray(float(num_samples)))

    def score(model, valid):
        r = residual(model, data)
        r = jnp.where(data_mask, r, jnp.inf)
        r_sorted = jnp.sort(r)
        alpha = jnp.clip(alpha0 * r_sorted, 1e-12, 1.0)
        # log10 NFA for each k (only k > s meaningful).
        lognfa = (log_models + _log_comb(n_f, ks) / jnp.log(10.0)
                  + _log_comb(ks, s_f) / jnp.log(10.0)
                  + (ks - s_f) * jnp.log10(alpha))
        bad = (ks <= s_f) | (r_sorted > max_threshold)
        lognfa = jnp.where(bad, jnp.inf, lognfa)
        best_k = jnp.argmin(lognfa)
        best = lognfa[best_k]
        thr = r_sorted[best_k]
        return jnp.where(valid, best, jnp.inf), thr

    nfas, thrs = jax.vmap(score)(flat_models, flat_valid)
    b = jnp.argmin(nfas)
    best_model = jax.tree_util.tree_map(lambda a: a[b], flat_models)
    r = residual(best_model, data)
    inliers = (r <= thrs[b]) & data_mask
    return OrsaResult(
        model=best_model,
        inliers=inliers,
        num_inliers=jnp.sum(inliers.astype(jnp.int32)),
        log_nfa=nfas[b],
        success=nfas[b] < log_nfa_max,
    )
