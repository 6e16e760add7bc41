"""Chessboard corner detection for calibration.

TPU-native rebuild of the reference's ChessboardDetector
(reference: cpp/src/DO/Sara/ChessboardDetection/ChessboardDetector.hpp:29-250
— Gaussian pyramid, Harris sigma_D=0.8 / sigma_I=2.4 / kappa=0.04, circular
intensity profiles around candidate corners, square-graph reconstruction,
ordered corner output; JunctionDetection.hpp, SquareReconstruction.hpp).

Split of labor: corner response + NMS + subpixel refinement + circular
profile validation run as one vectorized device program; the square-grid
assembly (BFS over candidate corners) is host-side NumPy, like the
reference's graph stage.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from sara_tpu.image.differential import harris_cornerness
from sara_tpu.image.filtering import gaussian_blur


@dataclass(frozen=True)
class ChessboardParams:
    sigma_d: float = 0.8
    sigma_i: float = 2.4
    kappa: float = 0.04
    capacity: int = 512
    profile_radius: float = 5.0
    profile_samples: int = 32
    nms_radius: int = 4


@functools.partial(jax.jit, static_argnames=("params",))
def _corner_candidates(image: jnp.ndarray, params: ChessboardParams):
    """Harris x-corner candidates + circular-profile validation (device)."""
    H, W = image.shape
    c = harris_cornerness(image, params.sigma_d, params.sigma_i, params.kappa)

    # NMS over a (2r+1)^2 window with lexicographic tie-breaking: strictly
    # greater than "later" neighbors, >= "earlier" ones — exact ties (common
    # in synthetic/symmetric images) then keep exactly one pixel.
    r = params.nms_radius
    pad = jnp.pad(c, r, mode="constant", constant_values=-jnp.inf)
    neigh_late = jnp.full_like(c, -jnp.inf)
    neigh_early = jnp.full_like(c, -jnp.inf)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy == 0 and dx == 0:
                continue
            sl = pad[r + dy: r + dy + H, r + dx: r + dx + W]
            if (dy, dx) > (0, 0):
                neigh_late = jnp.maximum(neigh_late, sl)
            else:
                neigh_early = jnp.maximum(neigh_early, sl)
    is_max = (c > neigh_late) & (c >= neigh_early) & (c > 0)
    b = 8
    interior = jnp.zeros((H, W), bool).at[b:H - b, b:W - b].set(True)
    score = jnp.where(is_max & interior, c, -jnp.inf).reshape(-1)
    K = params.capacity
    vals, idx = jax.lax.top_k(score, min(K, score.shape[0]))
    y = (idx // W).astype(jnp.float32)
    x = (idx % W).astype(jnp.float32)
    valid = jnp.isfinite(vals)

    # Subpixel refinement on the cornerness surface.
    yi = idx // W
    xi = idx % W
    offs = jnp.arange(-1, 2)
    yy = jnp.clip(yi[:, None] + offs, 0, H - 1)
    xx = jnp.clip(xi[:, None] + offs, 0, W - 1)
    patch = c[yy[:, :, None], xx[:, None, :]]
    gy = 0.5 * (patch[:, 2, 1] - patch[:, 0, 1])
    gx = 0.5 * (patch[:, 1, 2] - patch[:, 1, 0])
    hyy = patch[:, 2, 1] + patch[:, 0, 1] - 2 * patch[:, 1, 1]
    hxx = patch[:, 1, 2] + patch[:, 1, 0] - 2 * patch[:, 1, 1]
    hxy = 0.25 * (patch[:, 2, 2] - patch[:, 2, 0]
                  - patch[:, 0, 2] + patch[:, 0, 0])
    det = hxx * hyy - hxy * hxy
    det = jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    dx_ = jnp.clip(-(hyy * gx - hxy * gy) / det, -1.0, 1.0)
    dy_ = jnp.clip(-(hxx * gy - hxy * gx) / det, -1.0, 1.0)
    x = x + dx_
    y = y + dy_

    # Gradient-orthogonality subpixel refinement (cornerSubPix-style): at a
    # saddle, every window gradient is orthogonal to the offset to the true
    # corner, so p = (sum w g g^T)^-1 (sum w g g^T q) — exact for ideal
    # x-corners, much more accurate than the Harris-surface quadratic
    # (reference refines junctions similarly, JunctionRefinement.hpp).
    from sara_tpu.image.differential import gradient as _grad

    smr = gaussian_blur(image, 0.8)
    gx_img, gy_img = _grad(smr)
    win = 4
    offr = jnp.arange(-win, win + 1, dtype=jnp.float32)
    wg = jnp.exp(-(offr ** 2) / (2.0 * (win / 2.0) ** 2))
    Wwin = wg[:, None] * wg[None, :]

    def _bilin(imgz, yy_, xx_):
        yyc = jnp.clip(yy_, 0.0, H - 1.0)
        xxc = jnp.clip(xx_, 0.0, W - 1.0)
        y0_ = jnp.floor(yyc).astype(jnp.int32)
        x0_ = jnp.floor(xxc).astype(jnp.int32)
        y1_ = jnp.minimum(y0_ + 1, H - 1)
        x1_ = jnp.minimum(x0_ + 1, W - 1)
        fy_ = yyc - y0_
        fx_ = xxc - x0_
        return (imgz[y0_, x0_] * (1 - fx_) * (1 - fy_)
                + imgz[y0_, x1_] * fx_ * (1 - fy_)
                + imgz[y1_, x0_] * (1 - fx_) * fy_
                + imgz[y1_, x1_] * fx_ * fy_)

    def _subpix(px, py):
        def it(_, p):
            qx = p[0] + offr[None, :]
            qy = p[1] + offr[:, None]
            qxg = jnp.broadcast_to(qx, (2 * win + 1, 2 * win + 1))
            qyg = jnp.broadcast_to(qy, (2 * win + 1, 2 * win + 1))
            gxs = _bilin(gx_img, qyg, qxg)
            gys = _bilin(gy_img, qyg, qxg)
            a = jnp.sum(Wwin * gxs * gxs)
            bmix = jnp.sum(Wwin * gxs * gys)
            c2 = jnp.sum(Wwin * gys * gys)
            bx = jnp.sum(Wwin * (gxs * gxs * qxg + gxs * gys * qyg))
            by = jnp.sum(Wwin * (gxs * gys * qxg + gys * gys * qyg))
            det = a * c2 - bmix * bmix
            det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
            nx = (c2 * bx - bmix * by) / det
            ny = (a * by - bmix * bx) / det
            # Clamp the step so refinement cannot run away.
            nx = jnp.clip(nx, p[0] - 2.0, p[0] + 2.0)
            ny = jnp.clip(ny, p[1] - 2.0, p[1] + 2.0)
            return jnp.stack([nx, ny])

        p = jax.lax.fori_loop(0, 3, it, jnp.stack([px, py]))
        return p[0], p[1]

    x, y = jax.vmap(_subpix)(x, y)

    # Circular intensity profile: an x-corner alternates dark/light 4 times
    # (reference: ChessboardDetector circular profile check).
    sm = gaussian_blur(image, 1.0)
    S = params.profile_samples
    ang = jnp.arange(S, dtype=jnp.float32) / S * 2 * jnp.pi
    px = x[:, None] + params.profile_radius * jnp.cos(ang)[None, :]
    py = y[:, None] + params.profile_radius * jnp.sin(ang)[None, :]
    pxc = jnp.clip(px, 0.0, W - 1.0)
    pyc = jnp.clip(py, 0.0, H - 1.0)
    x0 = jnp.floor(pxc).astype(jnp.int32)
    y0 = jnp.floor(pyc).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = pxc - x0
    fy = pyc - y0
    prof = (sm[y0, x0] * (1 - fx) * (1 - fy) + sm[y0, x1] * fx * (1 - fy)
            + sm[y1, x0] * (1 - fx) * fy + sm[y1, x1] * fx * fy)  # (K, S)
    prof = prof - jnp.mean(prof, axis=1, keepdims=True)
    # X-corner test via circular harmonics: a quadrant (dark/light x 2)
    # pattern concentrates its energy in the 2nd harmonic, an edge in the
    # 1st, a blob in none. This replaces sign-change counting, which is
    # fragile when samples land exactly on a transition (symmetric boards).
    harm = jnp.arange(1, 5, dtype=jnp.float32)          # harmonics 1..4
    ph = ang[None, :] * harm[:, None]                    # (4, S)
    cosb, sinb = jnp.cos(ph), jnp.sin(ph)
    cr = prof @ cosb.T                                   # (K, 4)
    ci = prof @ sinb.T
    energy = cr * cr + ci * ci                           # (K, 4)
    e_tot = jnp.sum(prof * prof, axis=1) * (S / 2.0) + 1e-12
    e2 = energy[:, 1]
    dominant = ((e2 > energy[:, 0]) & (e2 > energy[:, 2])
                & (e2 > energy[:, 3]) & (e2 > 0.35 * e_tot))
    # Balanced dark/light occupancy.
    frac_pos = jnp.mean((prof > 0).astype(jnp.float32), axis=1)
    is_xcorner = dominant & (frac_pos > 0.25) & (frac_pos < 0.75)

    return {"x": x, "y": y, "score": vals,
            "mask": valid & is_xcorner}


def detect_chessboard_corners(image, params: ChessboardParams = ChessboardParams(),
                              expected_size: tuple | None = None):
    """Detect and order chessboard inner corners.

    Returns (corners (rows, cols, 2) float array, ok flag). Ordering is
    row-major along the board's two lattice directions; None if no coherent
    grid was found.
    """
    out = _corner_candidates(jnp.asarray(image, jnp.float32), params)
    m = np.asarray(out["mask"])
    xs = np.asarray(out["x"])[m]
    ys = np.asarray(out["y"])[m]
    if len(xs) < 4:
        return None, False
    pts = np.stack([xs, ys], axis=1)
    grid = _assemble_grid(pts)

    def _matches(g):
        return (g is not None and expected_size is not None
                and tuple(g.shape[:2]) in (tuple(expected_size),
                                           tuple(expected_size)[::-1]))

    if grid is None or (expected_size is not None and not _matches(grid)):
        # Fallback: edge-chain square reconstruction + square-graph
        # embedding — robust to the strong distortion that breaks the
        # linear-prediction BFS (reference: SquareReconstruction.cpp,
        # SquareGraph.hpp).
        from sara_tpu.calib.squares import assemble_grid_from_squares

        grid2 = assemble_grid_from_squares(np.asarray(image, np.float32),
                                           pts)
        if grid2 is not None and (expected_size is None or _matches(grid2)):
            grid = grid2
    if grid is None:
        return None, False
    if expected_size is not None and not _matches(grid):
        return grid, False
    return grid, True


def _assemble_grid(pts: np.ndarray):
    """Greedy lattice BFS: place corners on integer grid coordinates
    (host-side; reference: SquareReconstruction.hpp)."""
    from scipy.spatial import cKDTree

    n = len(pts)
    tree = cKDTree(pts)
    # Seed: the corner closest to the centroid.
    seed = int(np.argmin(np.linalg.norm(pts - pts.mean(axis=0), axis=1)))
    d, idx = tree.query(pts[seed], k=min(5, n))
    if len(idx) < 3:
        return None
    # Lattice basis: nearest neighbor -> e1; the neighbor most orthogonal
    # to e1 -> e2.
    e1 = pts[idx[1]] - pts[seed]
    best = None
    for j in idx[2:]:
        v = pts[j] - pts[seed]
        cosang = abs(np.dot(v, e1)) / (np.linalg.norm(v) * np.linalg.norm(e1))
        if best is None or cosang < best[0]:
            best = (cosang, v)
    if best is None or best[0] > 0.5:
        return None
    e2 = best[1]

    tol = 0.35 * min(np.linalg.norm(e1), np.linalg.norm(e2))
    coords = {seed: (0, 0)}
    frontier = [seed]
    used = {seed}
    basis = {seed: (e1.copy(), e2.copy())}
    while frontier:
        cur = frontier.pop()
        ci, cj = coords[cur]
        b1, b2 = basis[cur]
        for (di, dj, v) in ((1, 0, b1), (-1, 0, -b1), (0, 1, b2), (0, -1, -b2)):
            tgt = (ci + di, cj + dj)
            if tgt in coords.values():
                continue
            pred = pts[cur] + v
            dd, jj = tree.query(pred)
            if dd < tol and jj not in used:
                coords[jj] = tgt
                used.add(jj)
                frontier.append(jj)
                # Local basis update follows the measured step.
                step = pts[jj] - pts[cur]
                if di != 0:
                    basis[jj] = (step * di, b2)
                else:
                    basis[jj] = (b1, step * dj)

    if len(coords) < 4:
        return None
    ij = np.asarray(list(coords.values()))
    imin, jmin = ij.min(axis=0)
    imax, jmax = ij.max(axis=0)
    rows = imax - imin + 1
    cols = jmax - jmin + 1
    grid = np.full((rows, cols, 2), np.nan)
    for k, (i, j) in coords.items():
        grid[i - imin, j - jmin] = pts[k]
    if np.isnan(grid).any():
        # Incomplete lattice: return the largest complete sub-grid if any.
        return None
    return grid
