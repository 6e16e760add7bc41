"""Pallas kernel correctness tests (interpret mode on CPU; the same kernels
compile natively on TPU)."""

import jax.numpy as jnp
import numpy as np

from sara_tpu.image.filtering import gaussian_kernel_1d, separable_conv2d
from sara_tpu.ops import separable_conv_rows_pallas, pairwise_sqdist_pallas


def test_conv_rows_matches_xla(rng):
    img = jnp.asarray(rng.random((64, 96)).astype(np.float32))
    taps = gaussian_kernel_1d(1.6).astype(jnp.float32)
    radius = taps.shape[0] // 2
    ours = np.asarray(separable_conv_rows_pallas(img, taps, radius))
    # Reference: row pass only == separable conv with identity column taps.
    ref = np.asarray(separable_conv2d(img, taps, jnp.asarray([1.0], jnp.float32)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_pairwise_sqdist_tiled(rng):
    da = jnp.asarray(rng.random((512, 128)).astype(np.float32))
    db = jnp.asarray(rng.random((512, 128)).astype(np.float32))
    ours = np.asarray(pairwise_sqdist_pallas(da, db, tile_a=256, tile_b=256))
    ref = ((np.asarray(da)[:, None] - np.asarray(db)[None]) ** 2).sum(-1)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_pairwise_sqdist_fallback_shapes(rng):
    da = jnp.asarray(rng.random((100, 64)).astype(np.float32))
    db = jnp.asarray(rng.random((60, 64)).astype(np.float32))
    ours = np.asarray(pairwise_sqdist_pallas(da, db))
    ref = ((np.asarray(da)[:, None] - np.asarray(db)[None]) ** 2).sum(-1)
    np.testing.assert_allclose(ours, ref, atol=1e-3)
