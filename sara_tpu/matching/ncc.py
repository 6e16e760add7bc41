"""Normalized cross-correlation patch matching.

TPU-native rebuild of the reference's NCC matcher
(reference: cpp/src/DO/Sara/FeatureMatching/NCC.hpp): patches around
keypoints are zero-mean/unit-norm normalized and correlated as one GEMM on
the MXU — the exact dense analog of the descriptor matcher.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def extract_patches(image: jnp.ndarray, xy: jnp.ndarray, radius: int):
    """Gather (2r+1)^2 patches at integer-rounded centers; returns
    (K, P*P) rows plus an inside-image mask."""
    H, W = image.shape
    xc = jnp.round(xy[:, 0]).astype(jnp.int32)
    yc = jnp.round(xy[:, 1]).astype(jnp.int32)
    offs = jnp.arange(-radius, radius + 1)
    yy = yc[:, None] + offs
    xx = xc[:, None] + offs
    inside = ((yy >= 0) & (yy < H)).all(axis=1) & ((xx >= 0) & (xx < W)).all(axis=1)
    patch = image[jnp.clip(yy, 0, H - 1)[:, :, None],
                  jnp.clip(xx, 0, W - 1)[:, None, :]]
    return patch.reshape(patch.shape[0], -1), inside


def normalize_rows(p: jnp.ndarray) -> jnp.ndarray:
    p = p - jnp.mean(p, axis=-1, keepdims=True)
    return p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-8)


@functools.partial(jax.jit, static_argnames=("radius",))
def ncc_match(image_a, xy_a, mask_a, image_b, xy_b, mask_b,
              radius: int = 7, min_score: float = 0.7):
    """Match keypoints by best NCC score with mutual consistency.

    Returns (j (Ka,), score (Ka,), ok (Ka,)).
    """
    pa, ia = extract_patches(image_a, xy_a, radius)
    pb, ib = extract_patches(image_b, xy_b, radius)
    pa = normalize_rows(pa)
    pb = normalize_rows(pb)
    corr = pa @ pb.T  # (Ka, Kb) on the MXU
    va = mask_a & ia
    vb = mask_b & ib
    corr = jnp.where(va[:, None] & vb[None, :], corr, -jnp.inf)
    j = jnp.argmax(corr, axis=1)
    s = jnp.max(corr, axis=1)
    jT = jnp.argmax(corr, axis=0)
    ok = va & (s >= min_score) & (jT[j] == jnp.arange(corr.shape[0]))
    return j.astype(jnp.int32), s, ok
