"""SLIC superpixel segmentation.

TPU-native rebuild of the reference's GPU SLIC
(reference: cpp/src/DO/Shakti/Cuda/Segmentation/SuperPixel.cu). The
data-dependent nearest-cluster search is restructured as a dense
fixed-iteration program: every pixel evaluates the 9 candidate clusters of
its grid neighborhood (SLIC's locality guarantee), assignments and cluster
updates are pure array ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("grid", "iters", "compactness"))
def slic(image: jnp.ndarray, grid: int = 16, iters: int = 10,
         compactness: float = 0.1):
    """Segment a (H, W) or (H, W, C) float image into ~(H/grid)*(W/grid)
    superpixels.

    Returns (labels (H, W) int32, centers (Gy, Gx, 2+C)).
    """
    if image.ndim == 2:
        img = image[..., None]
    else:
        img = image
    H, W, C = img.shape
    Gy = max(H // grid, 1)
    Gx = max(W // grid, 1)

    ys = (jnp.arange(Gy, dtype=jnp.float32) + 0.5) * (H / Gy)
    xs = (jnp.arange(Gx, dtype=jnp.float32) + 0.5) * (W / Gx)
    cy, cx = jnp.meshgrid(ys, xs, indexing="ij")

    def sample(cy, cx):
        yi = jnp.clip(cy.astype(jnp.int32), 0, H - 1)
        xi = jnp.clip(cx.astype(jnp.int32), 0, W - 1)
        return img[yi, xi]

    centers_pos = jnp.stack([cy, cx], axis=-1)          # (Gy, Gx, 2)
    centers_col = sample(cy, cx)                         # (Gy, Gx, C)

    py, px = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    # Spatial scale: normalize pixel distance by the grid step.
    inv_s2 = (compactness / grid) ** 2

    def assign(centers_pos, centers_col):
        # Each pixel's home grid cell.
        gy = jnp.clip((py / (H / Gy)).astype(jnp.int32), 0, Gy - 1)
        gx = jnp.clip((px / (W / Gx)).astype(jnp.int32), 0, Gx - 1)
        best_d = jnp.full((H, W), jnp.inf)
        best_l = jnp.zeros((H, W), jnp.int32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ny = jnp.clip(gy + dy, 0, Gy - 1)
                nx = jnp.clip(gx + dx, 0, Gx - 1)
                cpos = centers_pos[ny, nx]               # (H, W, 2)
                ccol = centers_col[ny, nx]               # (H, W, C)
                d_sp = ((py - cpos[..., 0]) ** 2 + (px - cpos[..., 1]) ** 2)
                d_col = jnp.sum((img - ccol) ** 2, axis=-1)
                d = d_col + inv_s2 * d_sp
                lbl = ny * Gx + nx
                upd = d < best_d
                best_d = jnp.where(upd, d, best_d)
                best_l = jnp.where(upd, lbl, best_l)
        return best_l

    def update(labels):
        n = Gy * Gx
        onel = labels.reshape(-1)
        w = jnp.ones_like(onel, jnp.float32)
        sy = jax.ops.segment_sum(py.reshape(-1), onel, n)
        sx = jax.ops.segment_sum(px.reshape(-1), onel, n)
        sc = jax.ops.segment_sum(img.reshape(-1, C), onel, n)
        cnt = jax.ops.segment_sum(w, onel, n)
        cnt = jnp.maximum(cnt, 1.0)
        pos = jnp.stack([sy / cnt, sx / cnt], axis=-1).reshape(Gy, Gx, 2)
        col = (sc / cnt[:, None]).reshape(Gy, Gx, C)
        return pos, col

    def body(_, state):
        cpos, ccol = state
        labels = assign(cpos, ccol)
        return update(labels)

    centers_pos, centers_col = jax.lax.fori_loop(
        0, iters, body, (centers_pos, centers_col))
    labels = assign(centers_pos, centers_col)
    centers = jnp.concatenate([centers_pos, centers_col], axis=-1)
    return labels, centers
