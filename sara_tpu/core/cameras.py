"""Camera models: pinhole, Brown-Conrady, Kannala-Brandt fisheye, omnidirectional.

TPU-native rebuild of the reference camera layer
(reference: cpp/src/DO/Sara/MultiViewGeometry/Camera/v2/PinholeCamera.hpp:125-140,
v2/BrownConradyCamera.hpp:153-205, v2/OmnidirectionalCamera.hpp:226-300,
Camera/KannalaBrandtFisheyeDistortionModel.hpp).

Every model is a NamedTuple pytree of arrays, so cameras batch/vmap/shard
naturally. Coordinates follow the reference convention: ``project`` maps a
camera-frame 3-D point to pixels, ``backproject`` maps pixels to a unit-free
ray in the camera frame. Undistortion is the reference's fixed-point
iteration, expressed as ``lax.fori_loop`` so it stays jittable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Pinhole(NamedTuple):
    """fx, fy, shear s, principal point (u0, v0)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    s: jnp.ndarray
    u0: jnp.ndarray
    v0: jnp.ndarray

    @staticmethod
    def from_values(fx, fy, u0, v0, s=0.0) -> "Pinhole":
        f = lambda v: jnp.asarray(v, jnp.float32)
        return Pinhole(f(fx), f(fy), f(s), f(u0), f(v0))

    @staticmethod
    def from_matrix(K) -> "Pinhole":
        K = jnp.asarray(K, jnp.float32)
        return Pinhole(K[..., 0, 0], K[..., 1, 1], K[..., 0, 1], K[..., 0, 2], K[..., 1, 2])

    def matrix(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        K = jnp.stack([self.fx, self.s, self.u0,
                       z, self.fy, self.v0,
                       z, z, o], axis=-1)
        return K.reshape(self.fx.shape + (3, 3))

    def project(self, X: jnp.ndarray) -> jnp.ndarray:
        """Camera-frame 3-D point(s) (..., 3) -> pixel(s) (..., 2)."""
        x = X[..., 0] / X[..., 2]
        y = X[..., 1] / X[..., 2]
        u = self.fx * x + self.s * y + self.u0
        v = self.fy * y + self.v0
        return jnp.stack([u, v], axis=-1)

    def backproject(self, uv: jnp.ndarray) -> jnp.ndarray:
        """Pixel(s) (..., 2) -> ray(s) (..., 3) with z=1."""
        y = (uv[..., 1] - self.v0) / self.fy
        x = (uv[..., 0] - self.u0 - self.s * y) / self.fx
        return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


class BrownConrady(NamedTuple):
    """Pinhole + radial (k1,k2,k3) and tangential (p1,p2) distortion.

    Distortion acts on normalized coordinates exactly as the reference:
    ``x_d = x (1 + k1 r^2 + k2 r^4 + k3 r^6) + (r^2 I + 2 x x^T) p``
    (reference: v2/BrownConradyCamera.hpp:153-170).
    """

    K: Pinhole
    k: jnp.ndarray  # (3,) radial
    p: jnp.ndarray  # (2,) tangential

    @staticmethod
    def from_values(fx, fy, u0, v0, k=(0.0, 0.0, 0.0), p=(0.0, 0.0), s=0.0):
        return BrownConrady(Pinhole.from_values(fx, fy, u0, v0, s),
                            jnp.asarray(k, jnp.float32), jnp.asarray(p, jnp.float32))

    def distort(self, xn: jnp.ndarray) -> jnp.ndarray:
        """Normalized coords (..., 2) -> distorted normalized coords."""
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + self.k[0] * r2 + self.k[1] * r2 * r2 + self.k[2] * r2 * r2 * r2
        p1, p2 = self.p[0], self.p[1]
        # (r^2 I + 2 x x^T) p expanded
        tx = r2 * p1 + 2.0 * x * (x * p1 + y * p2)
        ty = r2 * p2 + 2.0 * y * (x * p1 + y * p2)
        return jnp.stack([x * radial + tx, y * radial + ty], axis=-1)

    def undistort(self, xd: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
        """Inverse distortion by fixed-point iteration x <- xd - d(x) + x.

        Matches the reference's <=10-iteration Newton-free scheme
        (v2/BrownConradyCamera.hpp:173-184).
        """

        def body(_, xu):
            return xd - (self.distort(xu) - xu)

        return jax.lax.fori_loop(0, iters, body, xd)

    def project(self, X: jnp.ndarray) -> jnp.ndarray:
        xn = X[..., :2] / X[..., 2:3]
        xd = self.distort(xn)
        z = jnp.ones_like(xd[..., :1])
        return self.K.project(jnp.concatenate([xd, z], axis=-1))

    def backproject(self, uv: jnp.ndarray) -> jnp.ndarray:
        ray = self.K.backproject(uv)
        xu = self.undistort(ray[..., :2])
        return jnp.concatenate([xu, jnp.ones_like(xu[..., :1])], axis=-1)


class KannalaBrandt(NamedTuple):
    """Fisheye model: theta-polynomial distortion (k1..k4).

    r(theta) = theta + k1 theta^3 + k2 theta^5 + k3 theta^7 + k4 theta^9
    (reference: Camera/KannalaBrandtFisheyeDistortionModel.hpp).
    """

    K: Pinhole
    k: jnp.ndarray  # (4,)

    def project(self, X: jnp.ndarray) -> jnp.ndarray:
        x, y, z = X[..., 0], X[..., 1], X[..., 2]
        r = jnp.sqrt(x * x + y * y)
        theta = jnp.arctan2(r, z)
        t2 = theta * theta
        rd = theta * (1.0 + t2 * (self.k[0] + t2 * (self.k[1] + t2 * (self.k[2] + t2 * self.k[3]))))
        scale = jnp.where(r > 1e-8, rd / jnp.clip(r, 1e-8, None), 1.0)
        xd = jnp.stack([x * scale, y * scale], axis=-1)
        one = jnp.ones_like(xd[..., :1])
        return self.K.project(jnp.concatenate([xd, one], axis=-1))

    def backproject(self, uv: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
        xd = self.K.backproject(uv)[..., :2]
        rd = jnp.linalg.norm(xd, axis=-1)

        def body(_, theta):
            t2 = theta * theta
            f = theta * (1.0 + t2 * (self.k[0] + t2 * (self.k[1] + t2 * (self.k[2] + t2 * self.k[3])))) - rd
            df = 1.0 + t2 * (3 * self.k[0] + t2 * (5 * self.k[1] + t2 * (7 * self.k[2] + t2 * 9 * self.k[3])))
            return theta - f / jnp.clip(df, 1e-8, None)

        theta = jax.lax.fori_loop(0, iters, body, rd)
        scale = jnp.where(rd > 1e-8, jnp.sin(theta) / jnp.clip(rd, 1e-8, None), 1.0)
        z = jnp.cos(theta)
        return jnp.stack([xd[..., 0] * scale, xd[..., 1] * scale, z], axis=-1)


class Omnidirectional(NamedTuple):
    """Unified mirror model (xi) + Brown-Conrady distortion.

    project: lift to unit sphere, shift by xi along z, perspective divide,
    distort, apply K (reference: v2/OmnidirectionalCamera.hpp:226-300).
    """

    K: Pinhole
    k: jnp.ndarray  # (3,) radial
    p: jnp.ndarray  # (2,) tangential
    xi: jnp.ndarray  # mirror parameter

    def _bc(self) -> BrownConrady:
        return BrownConrady(self.K, self.k, self.p)

    def project(self, X: jnp.ndarray) -> jnp.ndarray:
        Xs = X / jnp.linalg.norm(X, axis=-1, keepdims=True)
        denom = Xs[..., 2] + self.xi
        xn = Xs[..., :2] / denom[..., None]
        xd = self._bc().distort(xn)
        one = jnp.ones_like(xd[..., :1])
        return self.K.project(jnp.concatenate([xd, one], axis=-1))

    def backproject(self, uv: jnp.ndarray) -> jnp.ndarray:
        xd = self.K.backproject(uv)[..., :2]
        xu = self._bc().undistort(xd)
        # Invert the sphere lift: solve for the ray through (xu, 1) scaled so
        # the point lies on the unit sphere shifted by xi.
        r2 = jnp.sum(xu * xu, axis=-1)
        xi = self.xi
        disc = jnp.sqrt(1.0 + (1.0 - xi * xi) * r2)
        eta = (xi + disc) / (1.0 + r2)
        z = eta - xi
        return jnp.concatenate([eta[..., None] * xu, z[..., None]], axis=-1)


def undistortion_maps(camera, height: int, width: int):
    """Dense per-pixel sampling maps for warping a distorted image to pinhole.

    Returns (map_u, map_v), each (H, W) float32: for each undistorted output
    pixel, the source pixel in the distorted input — precomputed once like the
    reference's ImageDistortionCorrector
    (reference: SfM/Odometry/ImageDistortionCorrector.hpp:21-60).
    """
    u = jnp.arange(width, dtype=jnp.float32)
    v = jnp.arange(height, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)
    uv = jnp.stack([uu, vv], axis=-1)  # (H, W, 2)
    # Undistorted pixel -> normalized pinhole coords -> distort -> pixel.
    K = camera.K if hasattr(camera, "K") else camera
    xn = K.backproject(uv)[..., :2]
    if isinstance(camera, BrownConrady):
        xd = camera.distort(xn)
    elif isinstance(camera, Pinhole):
        xd = xn
    else:
        # Generic: project the (xn, 1) ray through the full model.
        ray = jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], axis=-1)
        pix = camera.project(ray)
        return pix[..., 0], pix[..., 1]
    one = jnp.ones_like(xd[..., :1])
    pix = K.project(jnp.concatenate([xd, one], axis=-1))
    return pix[..., 0], pix[..., 1]
