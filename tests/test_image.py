"""Image layer tests (cf. reference cpp/test/Sara/ImageProcessing/
test_imageprocessing_linear_filtering.cpp, _gaussian_pyramid.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sara_tpu.image import (
    gaussian_kernel_1d, separable_conv2d, gaussian_blur,
    gaussian_pyramid, dog_pyramid, PyramidParams,
    gradient, gradient_polar, laplacian, hessian, harris_cornerness,
    resize_bilinear, downscale2, warp_bilinear, bilinear_sample,
    rgb_to_gray, gray_from_any,
)


def test_gaussian_kernel_normalized():
    k = gaussian_kernel_1d(1.6)
    assert abs(float(k.sum()) - 1.0) < 1e-6
    assert k.shape[0] == 2 * int(np.ceil(4 * 1.6)) + 1


def test_separable_conv_matches_scipy(rng):
    from scipy.ndimage import gaussian_filter
    img = rng.random((40, 56)).astype(np.float32)
    ours = np.asarray(gaussian_blur(jnp.asarray(img), 2.0))
    ref = gaussian_filter(img, 2.0, mode="nearest", truncate=4.0)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_conv_constant_preserved():
    img = jnp.full((32, 32), 3.25)
    out = gaussian_blur(img, 1.6)
    np.testing.assert_allclose(np.asarray(out), 3.25, atol=1e-5)


def test_gradient_of_linear_ramp():
    H, W = 24, 32
    x = jnp.arange(W, dtype=jnp.float32)[None, :] * jnp.ones((H, 1))
    gx, gy = gradient(x)
    inner = np.asarray(gx)[1:-1, 1:-1]
    np.testing.assert_allclose(inner, 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy)[1:-1, 1:-1], 0.0, atol=1e-6)


def test_gradient_polar():
    H, W = 16, 16
    x = jnp.arange(W, dtype=jnp.float32)[None, :] * jnp.ones((H, 1))
    mag, ori = gradient_polar(x)
    np.testing.assert_allclose(np.asarray(mag)[2:-2, 2:-2], 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ori)[2:-2, 2:-2], 0.0, atol=1e-6)


def test_laplacian_of_quadratic():
    H, W = 24, 24
    xs = jnp.arange(W, dtype=jnp.float32)[None, :] * jnp.ones((H, 1))
    img = 0.5 * xs * xs
    lap = np.asarray(laplacian(img))[2:-2, 2:-2]
    np.testing.assert_allclose(lap, 1.0, atol=1e-4)


def test_hessian_entries(rng):
    H, W = 24, 24
    xs = jnp.arange(W, dtype=jnp.float32)[None, :] * jnp.ones((H, 1))
    ys = jnp.arange(H, dtype=jnp.float32)[:, None] * jnp.ones((1, W))
    img = xs * ys
    dxx, dxy, dyy = hessian(img)
    np.testing.assert_allclose(np.asarray(dxy)[2:-2, 2:-2], 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dxx)[2:-2, 2:-2], 0.0, atol=1e-4)


def test_pyramid_structure():
    img = jnp.zeros((128, 192))
    p = PyramidParams()
    gp = gaussian_pyramid(img, p)
    assert gp.octaves[0].shape == (6, 128, 192)
    assert gp.octaves[1].shape == (6, 64, 96)
    assert gp.octave_scales[1] == 2.0
    dg = dog_pyramid(gp)
    assert dg.octaves[0].shape == (5, 128, 192)


def test_pyramid_sigma_doubling(rng):
    """Scale S of octave o must equal (decimated) scale 0 of octave o+1."""
    img = jnp.asarray(rng.random((64, 64)).astype(np.float32))
    img = gaussian_blur(img, 2.0)  # smooth so decimation aliasing is small
    p = PyramidParams(border=4)
    gp = gaussian_pyramid(img, p)
    seed = np.asarray(downscale2(gp.octaves[0][p.scales_per_octave]))
    nxt = np.asarray(gp.octaves[1][0])
    np.testing.assert_allclose(seed, nxt, atol=1e-6)


def test_bilinear_sample_exact_at_integers(rng):
    img = jnp.asarray(rng.random((16, 16)).astype(np.float32))
    v = bilinear_sample(img, jnp.asarray(5.0), jnp.asarray(7.0))
    np.testing.assert_allclose(float(v), float(img[7, 5]), atol=1e-7)


def test_warp_identity(rng):
    img = jnp.asarray(rng.random((20, 30)).astype(np.float32))
    xx, yy = jnp.meshgrid(jnp.arange(30.0), jnp.arange(20.0))
    out = warp_bilinear(img, xx, yy)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_resize_shapes():
    img = jnp.zeros((20, 30))
    assert resize_bilinear(img, 40, 60).shape == (40, 60)


def test_gray_conversions():
    rgb = jnp.ones((4, 4, 3), jnp.float32)
    np.testing.assert_allclose(np.asarray(rgb_to_gray(rgb)), 1.0, atol=1e-6)
    u8 = (np.ones((4, 4, 3)) * 255).astype(np.uint8)
    np.testing.assert_allclose(np.asarray(gray_from_any(u8)), 1.0, atol=1e-6)


def test_harris_corner_response():
    # A white square on black background: corners respond positively.
    img = np.zeros((64, 64), np.float32)
    img[24:40, 24:40] = 1.0
    c = np.asarray(harris_cornerness(jnp.asarray(img), 0.8, 2.4))
    # Corner pixels should beat edge midpoints.
    assert c[24, 24] > c[24, 32]


def test_pyramid_grouped_matches_cascade(rng):
    """The TPU grouped direct-sigma octave must match the CPU cascade to
    discretization tolerance (same Gaussians by the semigroup property)."""
    from sara_tpu.image.pyramid import _octave_from_base_grouped
    from sara_tpu.image.filtering import gaussian_blur

    base = jnp.asarray(gaussian_blur(
        jnp.asarray(rng.random((64, 64)).astype(np.float32)), 1.6))
    sigma0, k, G = 1.6, 2.0 ** (1.0 / 3.0), 6
    grouped = np.asarray(_octave_from_base_grouped(base, sigma0, k, G))
    # Cascade reference.
    import math
    levels = [np.asarray(base)]
    cur = base
    for s in range(1, G):
        sig_prev = sigma0 * (k ** (s - 1))
        cur = gaussian_blur(cur, sig_prev * math.sqrt(k * k - 1.0))
        levels.append(np.asarray(cur))
    cascade = np.stack(levels)
    # Interior comparison (border handling differs slightly).
    d = np.abs(grouped - cascade)[:, 16:-16, 16:-16]
    assert d.max() < 5e-3, d.max()


def test_band_matrix_matches_separable_conv():
    """The TPU band-matmul path of separable_conv2d must equal the conv
    path exactly (incl. ASYMMETRIC kernels — convolution, not correlation,
    and edge-replicated borders)."""
    import numpy as np
    import jax.numpy as jnp
    from sara_tpu.image.filtering import band_matrix

    rs = np.random.RandomState(7)
    img = rs.rand(21, 34)
    kx = rs.rand(5)          # asymmetric on purpose
    ky = rs.rand(7)

    # Reference: edge-padded true convolution, rows then columns.
    def conv1d(a, k, axis):
        r = len(k) // 2
        pad = [(0, 0), (0, 0)]
        pad[axis] = (r, r)
        ap = np.pad(a, pad, mode="edge")
        out = np.zeros_like(a)
        for i, t in enumerate(k[::-1]):          # correlation with k[::-1]
            sl = [slice(None), slice(None)]
            sl[axis] = slice(i, i + a.shape[axis])
            out += t * ap[tuple(sl)]
        return out

    ref = conv1d(conv1d(img, kx, 1), ky, 0)

    Bw = band_matrix(kx[::-1], img.shape[1], 1)
    Bh = band_matrix(ky[::-1], img.shape[0], 1)
    got = Bh.T.astype(np.float64) @ img @ Bw.astype(np.float64)
    assert np.abs(got - ref).max() < 1e-6


def test_downscale2_matmul_bit_exact(rng):
    # The TPU selection-matmul path must be BIT-exact vs the strided slice
    # (each output element sums exactly one x*1.0 product).
    from sara_tpu.image.transform import _downscale2_matmul

    for shape in ((17, 23), (480, 640), (31, 32)):
        img = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        ref = np.asarray(img[::2, ::2])
        out = np.asarray(_downscale2_matmul(img))
        assert out.shape == ref.shape
        assert (out == ref).all()
