"""Resize, warp and interpolation.

TPU-native rebuild of the reference's geometric image transforms
(reference: cpp/src/DO/Sara/ImageProcessing/Resize.hpp, Warp.hpp,
Interpolation.hpp). All gather-based sampling is expressed with
``jnp.take``-style indexing that XLA vectorizes on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample ``image`` (H, W) or (H, W, C) at float coords (x, y), clamped.

    x, y may have any (matching) shape; output has that shape (+ C).
    """
    H, W = image.shape[0], image.shape[1]
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = x - x0
    fy = y - y0
    if image.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]
    v00 = image[y0, x0]
    v01 = image[y0, x1]
    v10 = image[y1, x0]
    v11 = image[y1, x1]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def resize_bilinear(image: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize using jax.image (XLA-native gather/conv path)."""
    import jax

    if image.ndim == 2:
        return jax.image.resize(image, (out_h, out_w), method="linear")
    return jax.image.resize(image, (out_h, out_w, image.shape[2]), method="linear")


def downscale2(image: jnp.ndarray) -> jnp.ndarray:
    """Decimate by 2 (every other pixel), like the reference's octave step
    (reference: ImageProcessing/GaussianPyramid.hpp downscale(2)).

    On TPU the strided slice lowers to a per-element gather (profiled at
    ~3 ms for a 960x1280 plane — gather rate, not bandwidth); expressing
    the decimation as two selection-matrix matmuls puts it on the MXU
    (~0.05 ms) and is bit-exact: each output row sums exactly one x*1.0
    product."""
    import jax

    if jax.default_backend() != "tpu" or image.ndim != 2:
        return image[..., ::2, ::2]
    return _downscale2_matmul(image)


def _downscale2_matmul(image: jnp.ndarray) -> jnp.ndarray:
    """Selection-matrix form of ``image[::2, ::2]`` (the TPU path); exposed
    separately so CPU tests can check bit-exactness vs the strided slice."""
    H, W = image.shape
    Ho, Wo = -(-H // 2), -(-W // 2)
    sel_h = jnp.zeros((Ho, H), image.dtype).at[jnp.arange(Ho),
                                               jnp.arange(Ho) * 2].set(1.0)
    sel_w = jnp.zeros((W, Wo), image.dtype).at[jnp.arange(Wo) * 2,
                                               jnp.arange(Wo)].set(1.0)
    return sel_h @ image @ sel_w


def upscale2(image: jnp.ndarray) -> jnp.ndarray:
    """Bilinear x2 upsample (reference: enlarge(2) for first_octave = -1)."""
    H, W = image.shape[-2], image.shape[-1]
    return resize_bilinear(image, 2 * H, 2 * W) if image.ndim == 2 else (
        resize_bilinear(image, 2 * H, 2 * W))


def warp_bilinear(image: jnp.ndarray, map_x: jnp.ndarray, map_y: jnp.ndarray,
                  fill_value: float = 0.0) -> jnp.ndarray:
    """Dense warp: out[i, j] = image(map_y[i,j], map_x[i,j]), bilinear.

    Out-of-bounds samples get ``fill_value``. This is the undistortion warp
    (reference: SfM/Odometry/ImageDistortionCorrector.hpp:46-59).
    """
    H, W = image.shape[0], image.shape[1]
    inside = (map_x >= 0) & (map_x <= W - 1) & (map_y >= 0) & (map_y <= H - 1)
    out = bilinear_sample(image, map_x, map_y)
    if image.ndim == 3:
        inside = inside[..., None]
    return jnp.where(inside, out, fill_value)


def warp_homography(image: jnp.ndarray, H_inv: jnp.ndarray,
                    out_h: int, out_w: int, fill_value: float = 0.0) -> jnp.ndarray:
    """Warp by a homography: out pixel p gets image(H_inv @ p)."""
    u = jnp.arange(out_w, dtype=jnp.float32)
    v = jnp.arange(out_h, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)
    ones = jnp.ones_like(uu)
    p = jnp.stack([uu, vv, ones], axis=-1)  # (H, W, 3)
    q = jnp.einsum("ij,hwj->hwi", H_inv, p)
    mx = q[..., 0] / q[..., 2]
    my = q[..., 1] / q[..., 2]
    return warp_bilinear(image, mx, my, fill_value)
