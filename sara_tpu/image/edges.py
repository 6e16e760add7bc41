"""Edge detection: Canny-style NMS + hysteresis, Hough lines, segments.

TPU-native rebuild of the reference edge machinery
(reference: cpp/src/DO/Sara/ImageProcessing/EdgeDetection.hpp — gradient +
non-max suppression + hysteresis; EdgeGrouping.hpp;
FeatureDetectors/EdgeDetector.hpp:23, LineSegmentDetector.hpp:22).

Design notes:
- orientation-quantized NMS is a branch-free 8-direction stencil,
- hysteresis is a fixed-iteration max-pool label propagation (the
  data-dependent BFS of the reference becomes an iterated 3x3 dilation of
  strong seeds restricted to the weak mask — jit-friendly and exact once
  iterated to the diameter of the weak components),
- line extraction is a dense Hough vote (scatter-add over a static
  (theta, rho) grid) + top-K peak readout with segment endpoints recovered
  by masked projections.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sara_tpu.image.differential import gradient
from sara_tpu.image.filtering import gaussian_blur


def _shift2(a: jnp.ndarray, dy: int, dx: int, fill):
    """Non-wrapping 2-D shift."""
    H, W = a.shape
    out = jnp.full_like(a, fill)
    ys = slice(max(dy, 0), H + min(dy, 0))
    xs = slice(max(dx, 0), W + min(dx, 0))
    ys_src = slice(max(-dy, 0), H + min(-dy, 0))
    xs_src = slice(max(-dx, 0), W + min(-dx, 0))
    return out.at[ys, xs].set(a[ys_src, xs_src])


def _dilate3(mask: jnp.ndarray) -> jnp.ndarray:
    """3x3 binary dilation via non-wrapping shifted ORs."""
    m = mask
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            m = m | _shift2(mask, dy, dx, False)
    return m


@functools.partial(jax.jit, static_argnames=("sigma", "hysteresis_iters"))
def canny(image: jnp.ndarray, low: float = 0.05, high: float = 0.15,
          sigma: float = 1.4, hysteresis_iters: int = 32):
    """Canny edge map of a (H, W) float image. Returns bool (H, W)."""
    sm = gaussian_blur(image, sigma)
    gx, gy = gradient(sm)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)

    # Quantize orientation into 4 NMS directions.
    a = jnp.mod(ang, jnp.pi)
    bins = jnp.floor((a + jnp.pi / 8) / (jnp.pi / 4)).astype(jnp.int32) % 4

    def shift(m, dy, dx):
        # Border-replicating shift via clamped index arithmetic: a wrapped
        # roll would compare against the opposite image border.
        H, W = m.shape
        ys = jnp.clip(jnp.arange(H) + dy, 0, H - 1)
        xs = jnp.clip(jnp.arange(W) + dx, 0, W - 1)
        return m[ys][:, xs]

    n0a, n0b = shift(mag, 0, 1), shift(mag, 0, -1)       # horizontal grad
    n1a, n1b = shift(mag, 1, 1), shift(mag, -1, -1)      # diag /
    n2a, n2b = shift(mag, 1, 0), shift(mag, -1, 0)       # vertical
    n3a, n3b = shift(mag, 1, -1), shift(mag, -1, 1)      # diag \
    na = jnp.select([bins == 0, bins == 1, bins == 2, bins == 3],
                    [n0a, n1a, n2a, n3a])
    nb = jnp.select([bins == 0, bins == 1, bins == 2, bins == 3],
                    [n0b, n1b, n2b, n3b])
    is_max = (mag >= na) & (mag >= nb)

    strong = is_max & (mag >= high)
    weak = is_max & (mag >= low)

    def body(_, s):
        return _dilate3(s) & weak

    edges = jax.lax.fori_loop(0, hysteresis_iters, body, strong)
    return edges


@functools.partial(jax.jit, static_argnames=("num_thetas", "num_rhos",
                                             "max_lines"))
def hough_lines(edge_map: jnp.ndarray, num_thetas: int = 180,
                num_rhos: int = 400, max_lines: int = 32):
    """Top-K lines (rho, theta) from an edge map by dense Hough voting.

    Returns (rho (K,), theta (K,), votes (K,)).
    """
    H, W = edge_map.shape
    diag = jnp.sqrt(float(H * H + W * W))
    thetas = jnp.linspace(0.0, jnp.pi, num_thetas, endpoint=False)
    ys, xs = jnp.mgrid[0:H, 0:W]
    pts = edge_map.reshape(-1).astype(jnp.float32)
    x = xs.reshape(-1).astype(jnp.float32)
    y = ys.reshape(-1).astype(jnp.float32)

    ct = jnp.cos(thetas)
    st = jnp.sin(thetas)
    # rho in [-diag, diag] -> bin index.
    rho = x[:, None] * ct[None, :] + y[:, None] * st[None, :]  # (N, T)
    rbin = jnp.clip(((rho + diag) / (2 * diag) * num_rhos), 0,
                    num_rhos - 1).astype(jnp.int32)
    tbin = jnp.broadcast_to(jnp.arange(num_thetas)[None, :], rbin.shape)
    acc = jnp.zeros((num_thetas, num_rhos), jnp.float32)
    acc = acc.at[tbin.reshape(-1), rbin.reshape(-1)].add(
        jnp.repeat(pts, num_thetas))
    # 3x3 non-max suppression on the accumulator.
    accp = jnp.pad(acc, 1, mode="constant")
    neigh = jnp.stack([accp[1 + dy: 1 + dy + num_thetas,
                            1 + dx: 1 + dx + num_rhos]
                       for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                       if not (dy == 0 and dx == 0)])
    is_peak = acc >= jnp.max(neigh, axis=0)
    score = jnp.where(is_peak, acc, 0.0).reshape(-1)
    votes, idx = jax.lax.top_k(score, max_lines)
    t_idx = idx // num_rhos
    r_idx = idx % num_rhos
    rho_out = (r_idx.astype(jnp.float32) + 0.5) / num_rhos * 2 * diag - diag
    return rho_out, thetas[t_idx], votes


@functools.partial(jax.jit, static_argnames=("max_lines",))
def line_segment_endpoints(edge_map: jnp.ndarray, rho, theta, votes,
                           max_lines: int = 32, band: float = 2.0):
    """Segment endpoints for Hough lines: project edge pixels within a band
    of each line onto its direction and take masked min/max."""
    H, W = edge_map.shape
    ys, xs = jnp.mgrid[0:H, 0:W]
    x = xs.astype(jnp.float32)
    y = ys.astype(jnp.float32)
    e = edge_map

    def one(r, th, v):
        ct, st = jnp.cos(th), jnp.sin(th)
        d = jnp.abs(x * ct + y * st - r)
        on = e & (d < band)
        # Direction along the line: (-st, ct).
        s = -x * st + y * ct
        s_on = jnp.where(on, s, jnp.nan)
        smin = jnp.nanmin(s_on)
        smax = jnp.nanmax(s_on)
        p0 = jnp.stack([r * ct - smin * st, r * st + smin * ct])
        p1 = jnp.stack([r * ct - smax * st, r * st + smax * ct])
        ok = (v > 0) & jnp.isfinite(smin)
        return p0, p1, ok

    return jax.vmap(one)(rho, theta, votes)
