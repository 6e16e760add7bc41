"""Minimal 3-D textured-scene renderer for integration tests.

Renders a texture-mapped box interior (floor + two walls at different
depths/orientations) by ray-plane intersection — enough parallax structure
for essential-matrix geometry to be well-posed, unlike a single plane.
Pure NumPy, vectorized over pixels.
"""

from __future__ import annotations

import numpy as np


class TexturedPlane:
    def __init__(self, origin, u_axis, v_axis, texture, u_range, v_range):
        self.o = np.asarray(origin, float)
        self.u = np.asarray(u_axis, float)
        self.v = np.asarray(v_axis, float)
        self.n = np.cross(self.u, self.v)
        self.n /= np.linalg.norm(self.n)
        self.tex = np.asarray(texture, np.float32)
        self.u_range = u_range
        self.v_range = v_range


def make_room(seed=0, tex_size=512):
    """Floor + back wall + side wall, each with smooth random texture."""
    rs = np.random.RandomState(seed)

    def texture():
        t = rs.rand(tex_size, tex_size).astype(np.float32)
        # Smooth at multiple scales for stable SIFT structure.
        from scipy.ndimage import gaussian_filter

        t = (0.5 * gaussian_filter(t, 2) + 0.3 * gaussian_filter(t, 6)
             + 0.2 * gaussian_filter(t, 16))
        t -= t.min()
        t /= max(t.max(), 1e-9)
        return 0.15 + 0.7 * t

    planes = [
        # Floor: y = +1.2, spanning x in [-4, 4], z in [0, 12].
        TexturedPlane([0, 1.2, 6], [1, 0, 0], [0, 0, 1], texture(),
                      (-4, 4), (-6, 6)),
        # Back wall: z = 12.
        TexturedPlane([0, 0, 12], [1, 0, 0], [0, 1, 0], texture(),
                      (-4, 4), (-3, 3)),
        # Side wall: x = -4.
        TexturedPlane([-4, 0, 6], [0, 0, 1], [0, 1, 0], texture(),
                      (-6, 6), (-3, 3)),
    ]
    return planes


def render(planes, K, R, t, hw=(240, 320), rays_cam=None):
    """Render the scene from camera (R, t) (world->cam). Returns (H, W).

    ``rays_cam`` (H*W, 3) overrides the pinhole ray grid — pass the
    backprojection of a distorted camera model (e.g. Brown-Conrady) to
    render THROUGH the distortion, mirroring how the reference's VO demos
    consume distorted phone video before ImageDistortionCorrector.
    """
    H, W = hw
    if rays_cam is None:
        Ki = np.linalg.inv(K)
        ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
        pix = np.stack([xs, ys, np.ones_like(xs)], axis=-1).reshape(-1, 3)
        rays_cam = pix @ Ki.T
    else:
        rays_cam = np.asarray(rays_cam, np.float64).reshape(-1, 3)
    Rw = R.T
    rays_w = rays_cam @ Rw.T          # directions in world frame
    cam_center = -Rw @ t

    best_t = np.full(len(rays_w), np.inf)
    img = np.full(len(rays_w), 0.05, np.float32)
    for pl in planes:
        denom = rays_w @ pl.n
        num = (pl.o - cam_center) @ pl.n
        with np.errstate(divide="ignore", invalid="ignore"):
            tt = num / denom
        pts = cam_center + rays_w * tt[:, None]
        du = (pts - pl.o) @ pl.u / (pl.u @ pl.u)
        dv = (pts - pl.o) @ pl.v / (pl.v @ pl.v)
        inside = ((tt > 0.1) & (du >= pl.u_range[0]) & (du <= pl.u_range[1])
                  & (dv >= pl.v_range[0]) & (dv <= pl.v_range[1]))
        closer = inside & (tt < best_t)
        th, tw = pl.tex.shape
        ui = np.clip(((du - pl.u_range[0]) / (pl.u_range[1] - pl.u_range[0])
                      * (tw - 1)), 0, tw - 1)
        vi = np.clip(((dv - pl.v_range[0]) / (pl.v_range[1] - pl.v_range[0])
                      * (th - 1)), 0, th - 1)
        # Parallel rays produce NaN intersections; they are masked out by
        # `inside` but must not poison the integer texture indices.
        ui = np.nan_to_num(ui, nan=0.0)
        vi = np.nan_to_num(vi, nan=0.0)
        # Bilinear texture sampling.
        u0 = np.floor(ui).astype(int)
        v0 = np.floor(vi).astype(int)
        u1 = np.minimum(u0 + 1, tw - 1)
        v1 = np.minimum(v0 + 1, th - 1)
        fu = ui - u0
        fv = vi - v0
        val = (pl.tex[v0, u0] * (1 - fu) * (1 - fv)
               + pl.tex[v0, u1] * fu * (1 - fv)
               + pl.tex[v1, u0] * (1 - fu) * fv
               + pl.tex[v1, u1] * fu * fv)
        img = np.where(closer, val.astype(np.float32), img)
        best_t = np.where(closer, tt, best_t)
    return img.reshape(H, W)
