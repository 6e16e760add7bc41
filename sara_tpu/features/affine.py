"""Affine shape adaptation of keypoints.

TPU-native rebuild of the reference's affine adaptation
(reference: cpp/src/DO/Sara/FeatureDetectors/AffineShapeAdaptation.hpp:43
``AdaptFeatureAffinelyToLocalShape`` — iteratively estimate the second-moment
matrix in the keypoint's normalized frame until isotropy). Fixed-iteration,
vmapped over keypoints.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sara_tpu.image.filtering import gaussian_blur


@functools.partial(jax.jit, static_argnames=("iters", "patch_radius"))
def adapt_affine_shapes(image: jnp.ndarray, xy: jnp.ndarray,
                        scale: jnp.ndarray, mask: jnp.ndarray,
                        iters: int = 5, patch_radius: int = 16):
    """Estimate a 2x2 shape matrix per keypoint.

    Returns (shape (K, 2, 2) with unit determinant, converged (K,)).
    The shape matrix M satisfies: the keypoint's neighborhood is isotropic
    under the whitening transform M^{-1/2} (reference semantics: OERegion
    shape_matrix, Features/Feature.hpp:40).
    """
    H, W = image.shape
    sm = gaussian_blur(image, 1.0)
    # Precompute gradients once.
    gx = 0.5 * (jnp.roll(sm, -1, 1) - jnp.roll(sm, 1, 1))
    gy = 0.5 * (jnp.roll(sm, -1, 0) - jnp.roll(sm, 1, 0))

    offs = jnp.arange(-patch_radius, patch_radius + 1, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(offs, offs)
    w_g = jnp.exp(-(uu ** 2 + vv ** 2) / (2.0 * (patch_radius / 2.0) ** 2))

    def bilin(img, ys, xs):
        ysc = jnp.clip(ys, 0.0, H - 1.0)
        xsc = jnp.clip(xs, 0.0, W - 1.0)
        y0 = jnp.floor(ysc).astype(jnp.int32)
        x0 = jnp.floor(xsc).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, H - 1)
        x1 = jnp.minimum(x0 + 1, W - 1)
        fy = ysc - y0
        fx = xsc - x0
        return (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x1] * fx * (1 - fy)
                + img[y1, x0] * (1 - fx) * fy + img[y1, x1] * fx * fy)

    def one(kp_xy, kp_scale):
        A0 = jnp.eye(2)

        def body(_, A):
            # Sample the patch in the whitened frame: p = xy + A (s u, s v).
            s = kp_scale / patch_radius * 3.0
            du = A[0, 0] * uu + A[0, 1] * vv
            dv = A[1, 0] * uu + A[1, 1] * vv
            xs = kp_xy[0] + s * du
            ys = kp_xy[1] + s * dv
            gxs = bilin(gx, ys, xs)
            gys = bilin(gy, ys, xs)
            # Rotate gradients into the whitened frame: g' = A^T g.
            gu = A[0, 0] * gxs + A[1, 0] * gys
            gv = A[0, 1] * gxs + A[1, 1] * gys
            muu = jnp.sum(w_g * gu * gu)
            muv = jnp.sum(w_g * gu * gv)
            mvv = jnp.sum(w_g * gv * gv)
            M = jnp.asarray([[muu, muv], [muv, mvv]])
            M = M / jnp.maximum(jnp.sqrt(jnp.linalg.det(M) + 1e-20), 1e-10)
            # Whiten: A <- A M^{-1/2}, renormalized to unit determinant.
            evals, evecs = jnp.linalg.eigh(M)
            inv_sqrt = evecs @ jnp.diag(1.0 / jnp.sqrt(
                jnp.maximum(evals, 1e-8))) @ evecs.T
            A2 = A @ inv_sqrt
            A2 = A2 / jnp.sqrt(jnp.maximum(jnp.linalg.det(A2), 1e-10))
            return A2

        A = jax.lax.fori_loop(0, iters, body, A0)
        # Shape matrix = (A A^T)^{-1}; converged if final anisotropy small.
        S = jnp.linalg.inv(A @ A.T + 1e-10 * jnp.eye(2))
        evals = jnp.linalg.eigvalsh(A @ A.T)
        conv = (evals[1] / jnp.maximum(evals[0], 1e-10)) < 16.0
        return S, conv

    shapes, conv = jax.vmap(one)(xy, scale)
    return shapes, conv & mask
