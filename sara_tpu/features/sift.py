"""SIFT descriptor (4x4 spatial bins x 8 orientation bins = 128-D).

TPU-native rebuild of the reference descriptor
(reference: cpp/src/DO/Sara/FeatureDescriptors/SIFT.hpp:44-263; algorithm
constants per SURVEY.md A.1: bin scale unit l = 3 sigma, Gaussian window
sigma_w = N/2 bin units, trilinear accumulation with orientation wraparound,
L2 normalize -> clamp 0.2 -> renormalize).

Vectorization strategy (the key TPU redesign): instead of iterating over all
image pixels in the support disk (radius sqrt(2)*l*(N+1)/2, data-dependent),
each keypoint samples a FIXED T x T grid (T = 4N) in its canonical frame via
bilinear interpolation of the gradient maps. Spatial trilinear weights then
depend only on the (static) grid position, so descriptor accumulation
factorizes into per-axis weight matrices and an einsum that XLA maps onto the
MXU — no scatters, no dynamic shapes. This is the same accumulation algebra
as the reference's GPU descriptor generators
(Shakti/Halide/Generators/SIFTGeneratorV5.cpp).
"""

from __future__ import annotations

import jax.numpy as jnp

N_SPATIAL = 4     # spatial bins per axis
N_ORI = 8         # orientation bins
T = 4 * N_SPATIAL  # sample grid size (16)
BIN_SCALE_UNIT = 3.0
MAX_BIN_VALUE = 0.2


def _spatial_weights(dtype=jnp.float32) -> jnp.ndarray:
    """(T, N_SPATIAL) linear interpolation weights of each sample row/col
    into the spatial bins. Sample i sits at bin coordinate u = (i+0.5)/4 - 0.5
    in [-0.5, 3.5]; weight to bin r is max(0, 1 - |u - r|)."""
    i = jnp.arange(T, dtype=dtype)
    u = (i + 0.5) / (T / N_SPATIAL) - 0.5  # (T,)
    r = jnp.arange(N_SPATIAL, dtype=dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(u[:, None] - r[None, :]))
    return w  # (T, N)


def _gaussian_window(dtype=jnp.float32) -> jnp.ndarray:
    """(T, T) Gaussian weight, sigma_w = N/2 bin units (reference:
    SIFT.hpp:112-113)."""
    i = jnp.arange(T, dtype=dtype)
    u = (i + 0.5) / (T / N_SPATIAL) - N_SPATIAL / 2.0  # centered bin coords
    g = jnp.exp(-(u ** 2) / (2.0 * (N_SPATIAL / 2.0) ** 2))
    return g[:, None] * g[None, :]


def _bilinear_gather(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """Bilinear sample a (H, W) image at float coords; also returns an
    in-bounds mask. ys/xs shapes broadcastable (..., )."""
    H, W = img.shape
    inside = (xs >= 0) & (xs <= W - 1) & (ys >= 0) & (ys <= H - 1)
    x = jnp.clip(xs, 0.0, W - 1.0)
    y = jnp.clip(ys, 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = x - x0
    fy = y - y0
    v = (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x1] * fx * (1 - fy)
         + img[y1, x0] * (1 - fx) * fy + img[y1, x1] * fx * fy)
    return v, inside


def sift_descriptors(mag: jnp.ndarray, ori: jnp.ndarray,
                     x, y, s, theta, sigmas) -> jnp.ndarray:
    """Compute 128-D SIFT descriptors for K keypoints in one octave.

    Args:
      mag, ori: (S, H, W) gradient magnitude/orientation stacks of the octave
        Gaussians.
      x, y: (K,) positions (octave pixel coords).
      s: (K,) continuous scale index.
      theta: (K,) keypoint orientation (radians).
      sigmas: per-scale sigmas (tuple of floats).

    Returns:
      descriptors: (K, 128) float32, L2-normalized with 0.2 clamping.
    """
    S = mag.shape[0]
    s_idx = jnp.clip(jnp.round(s).astype(jnp.int32), 0, S - 1)
    sig_table = jnp.asarray(sigmas, jnp.float32)
    sigma = sig_table[s_idx]
    l = BIN_SCALE_UNIT * sigma  # bin side length in pixels (K,)

    # Sample positions in the canonical keypoint frame: bin coords
    # u, v in [-2, 2] on a T x T grid, rotated by theta and scaled by l.
    i = jnp.arange(T, dtype=jnp.float32)
    u = (i + 0.5) / (T / N_SPATIAL) - N_SPATIAL / 2.0  # (T,)
    uu, vv = jnp.meshgrid(u, u)  # (T, T): uu = column (x'), vv = row (y')
    ct, st = jnp.cos(theta), jnp.sin(theta)
    # Pixel offsets: p = R(theta) @ (u*l, v*l).
    dx = (ct[:, None, None] * uu - st[:, None, None] * vv) * l[:, None, None]
    dy = (st[:, None, None] * uu + ct[:, None, None] * vv) * l[:, None, None]
    xs = x[:, None, None] + dx  # (K, T, T)
    ys = y[:, None, None] + dy

    # Gather gradient mag/ori at the sample points from each keypoint's scale.
    import jax

    def per_kp(si, ys_k, xs_k):
        m, inside = _bilinear_gather_dynamic(mag, si, ys_k, xs_k)
        o, _ = _bilinear_gather_dynamic(ori, si, ys_k, xs_k)
        return m, o, inside

    m, o, inside = jax.vmap(per_kp)(s_idx, ys, xs)

    # Rotate gradient orientations into the keypoint frame, bin over [0, 2pi).
    rel = jnp.mod(o - theta[:, None, None], 2.0 * jnp.pi)
    ob = rel / (2.0 * jnp.pi) * N_ORI  # (K, T, T) in [0, 8)
    o0 = jnp.floor(ob).astype(jnp.int32) % N_ORI
    o1 = (o0 + 1) % N_ORI
    fo = ob - jnp.floor(ob)

    w = m * _gaussian_window() * inside.astype(m.dtype)  # (K, T, T)

    # Orientation one-hot pair -> (K, T, T, 8); tiny static dim so XLA fuses.
    eye = jnp.eye(N_ORI, dtype=w.dtype)
    ori_w = eye[o0] * (1.0 - fo[..., None]) + eye[o1] * fo[..., None]

    Wrow = _spatial_weights()  # (T, 4) weights of row samples into row bins
    # descriptor[r, c, b] = sum_{i,j} Wrow[i,r] Wrow[j,c] w[i,j] ori_w[i,j,b]
    desc = jnp.einsum("ir,jc,kij,kijb->krcb", Wrow, Wrow, w, ori_w)
    desc = desc.reshape(desc.shape[0], N_SPATIAL * N_SPATIAL * N_ORI)

    # Normalize -> clamp 0.2 -> renormalize (reference: SIFT.hpp:241-252).
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-12)
    desc = jnp.minimum(desc, MAX_BIN_VALUE)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-12)
    return desc


def _bilinear_gather_dynamic(stack: jnp.ndarray, s_idx, ys, xs):
    """Bilinear sample stack[s_idx] at float coords (per-keypoint scale)."""
    Ssz, H, W = stack.shape
    inside = (xs >= 0) & (xs <= W - 1) & (ys >= 0) & (ys <= H - 1)
    x = jnp.clip(xs, 0.0, W - 1.0)
    y = jnp.clip(ys, 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = x - x0
    fy = y - y0
    img = jax_dynamic_index(stack, s_idx)
    v = (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x1] * fx * (1 - fy)
         + img[y1, x0] * (1 - fx) * fy + img[y1, x1] * fx * fy)
    return v, inside


def jax_dynamic_index(stack: jnp.ndarray, idx):
    import jax

    return jax.lax.dynamic_index_in_dim(stack, idx, axis=0, keepdims=False)


def root_sift(desc: jnp.ndarray) -> jnp.ndarray:
    """RootSIFT transform: L1-normalize then sqrt
    (reference: FeatureDescriptors/RootSIFT.hpp)."""
    l1 = jnp.sum(jnp.abs(desc), axis=-1, keepdims=True)
    return jnp.sqrt(desc / jnp.maximum(l1, 1e-12))
