"""Color conversion (reference: cpp/src/DO/Sara/Core/Pixel/ColorConversion.hpp,
ImageProcessing/FastColorConversion.hpp)."""

from __future__ import annotations

import jax.numpy as jnp

# ITU-R BT.601 luma weights, as used by the reference's rgb->gray.
_LUMA = jnp.array([0.299, 0.587, 0.114], jnp.float32)


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) float in [0,1] -> (H, W) float."""
    return jnp.einsum("...c,c->...", rgb[..., :3].astype(jnp.float32), _LUMA)


def gray_from_any(image: jnp.ndarray) -> jnp.ndarray:
    """uint8/float, gray or rgb(a) -> float32 gray in [0, 1]."""
    x = jnp.asarray(image)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    else:
        x = x.astype(jnp.float32)
    if x.ndim == 3:
        x = rgb_to_gray(x)
    return x
