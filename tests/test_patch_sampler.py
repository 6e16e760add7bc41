"""Pallas patch-DMA field sampler (ops/patch_sampler.py), interpret mode."""

import numpy as np
import jax.numpy as jnp
import pytest

from sara_tpu.ops.patch_sampler import (patch_extent, sample_field_patches)


def _xla_bilinear(maps, si, ys, xs):
    S, H, W, C = maps.shape
    K, N = ys.shape
    yc = jnp.clip(ys, 0, H - 1)
    xc = jnp.clip(xs, 0, W - 1)
    y0 = jnp.floor(yc).astype(jnp.int32)
    x0 = jnp.floor(xc).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    fy = (yc - y0)[..., None]
    fx = (xc - x0)[..., None]
    flat = maps.reshape(S * H * W, C)
    base = si[:, None] * (H * W)

    def tk(yy, xx):
        lin = (base + yy * W + xx).reshape(-1)
        return jnp.take(flat, lin, axis=0).reshape(K, N, C)

    return (tk(y0, x0) * (1 - fx) * (1 - fy) + tk(y0, x1) * fx * (1 - fy)
            + tk(y1, x0) * (1 - fx) * fy + tk(y1, x1) * fx * fy)


def _random_problem(rs, S=3, H=64, W=80, C=36, K=24, N=16, rad=5.0,
                    edge=False):
    maps = jnp.asarray(rs.rand(S, H, W, C).astype(np.float32))
    if edge:
        # Centers pinned to corners/edges: patch-origin clamping must keep
        # every clamped sample inside the patch.
        cy = rs.choice([0.0, 1.0, H - 2.0, H - 1.0], K)
        cx = rs.choice([0.0, 1.0, W - 2.0, W - 1.0], K)
    else:
        cy = rs.uniform(0, H - 1, K)
        cx = rs.uniform(0, W - 1, K)
    ys = jnp.asarray((cy[:, None] + rs.uniform(-rad, rad, (K, N))
                      ).astype(np.float32))
    xs = jnp.asarray((cx[:, None] + rs.uniform(-rad, rad, (K, N))
                      ).astype(np.float32))
    si = jnp.asarray(rs.randint(0, S, K).astype(np.int32))
    return maps, si, ys, xs


@pytest.mark.parametrize("edge", [False, True])
def test_matches_xla_bilinear(edge):
    rs = np.random.RandomState(3 + edge)
    maps, si, ys, xs = _random_problem(rs, edge=edge)
    out = sample_field_patches(maps, si, ys, xs, max_sample_radius=11.0,
                               interpret=True)
    ref = _xla_bilinear(maps, si, ys, xs)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)


def test_nondivisible_block_padding():
    rs = np.random.RandomState(7)
    maps, si, ys, xs = _random_problem(rs, K=13)
    out = sample_field_patches(maps, si, ys, xs, max_sample_radius=11.0,
                               block=8, interpret=True)
    ref = _xla_bilinear(maps, si, ys, xs)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_unfit_geometry_returns_none():
    rs = np.random.RandomState(1)
    maps, si, ys, xs = _random_problem(rs, H=16, W=16, rad=30.0)
    assert sample_field_patches(maps, si, ys, xs,
                                max_sample_radius=40.0,
                                interpret=True) is None


def test_patch_extent_bounds():
    assert patch_extent(1.0) == 8
    assert patch_extent(13.0) == 32
    assert patch_extent(100.0) == -1


def test_field_descriptor_fallback_matches_gather():
    """sampler='pallas' with unfit geometry falls back to the gather path
    (identical output); 'auto' on CPU is the gather path."""
    from sara_tpu.features.sift import sift_descriptors_field

    rs = np.random.RandomState(0)
    S, H, W = 3, 24, 24  # too small for any patch at this sigma range
    maps = jnp.asarray(rs.rand(S, H, W, 36).astype(np.float32))
    K = 6
    x = jnp.asarray(rs.uniform(4, W - 5, K).astype(np.float32))
    y = jnp.asarray(rs.uniform(4, H - 5, K).astype(np.float32))
    s = jnp.asarray(rs.uniform(0, S - 1, K).astype(np.float32))
    th = jnp.asarray(rs.uniform(-3, 3, K).astype(np.float32))
    sig = (1.6, 2.0, 2.5)
    a = sift_descriptors_field(maps, x, y, s, th, sig, sampler="pallas")
    b = sift_descriptors_field(maps, x, y, s, th, sig, sampler="gather")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_padded_channel_maps_consumers_match():
    """pad_channels=128 maps must give identical hist samples and field
    descriptors to the 36-channel maps (consumers slice [:36])."""
    import jax.numpy as jnp

    from sara_tpu.features.orientation import sample_orientation_maps
    from sara_tpu.features.sift import sift_descriptors_field

    rs = np.random.RandomState(5)
    S, H, W = 3, 32, 40
    maps = jnp.asarray(rs.rand(S, H, W, 36).astype(np.float32))
    maps_p = jnp.pad(maps, ((0, 0), (0, 0), (0, 0), (0, 92)))
    K = 7
    x = jnp.asarray(rs.uniform(6, W - 7, K).astype(np.float32))
    y = jnp.asarray(rs.uniform(6, H - 7, K).astype(np.float32))
    s = jnp.asarray(rs.uniform(0, S - 1, K).astype(np.float32))
    th = jnp.asarray(rs.uniform(-3, 3, K).astype(np.float32))

    a = sample_orientation_maps(maps, x, y, s)
    b = sample_orientation_maps(maps_p, x, y, s)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    sig = (1.2, 1.5, 1.9)
    da = sift_descriptors_field(maps, x, y, s, th, sig, sampler="gather")
    db = sift_descriptors_field(maps_p, x, y, s, th, sig, sampler="gather")
    np.testing.assert_allclose(np.asarray(da), np.asarray(db), atol=1e-6)


def test_unpacked_path_matches_too():
    rs = np.random.RandomState(11)
    maps, si, ys, xs = _random_problem(rs)
    a = sample_field_patches(maps, si, ys, xs, max_sample_radius=11.0,
                             pack_x=False, interpret=True)
    b = sample_field_patches(maps, si, ys, xs, max_sample_radius=11.0,
                             pack_x=True, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
