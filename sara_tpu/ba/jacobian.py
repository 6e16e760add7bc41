"""Closed-form reprojection Jacobians in flat (O,)-component form.

``jax.vmap(jax.jacfwd(project))`` measured 2.36 s at O=800k on TPU —
the forward-mode program materializes per-observation (2, 6) tangent
blocks whose tiny minor dimensions waste ~99% of every (8, 128) vector
tile (the same trap as the batched small-matrix LU, ops/smallmat.py).
Writing the chain rule by hand over (O,) component arrays keeps every op
a full-width elementwise vector op; the (O, 2, 6) blocks are only
materialized once at the end.

Math (world->camera pose (w, t), R = exp([w]x), Xc = R X + t):
  dpi/dXc = [[fx/z, 0, -fx x/z], [0, fy/z, -fy y/z]],  x = Xc0/z, ...
  dXc/dt  = I
  dXc/dX  = R
  dXc/dw  = -R [X]x Jr(w)   (right Jacobian of SO(3):
            Jr = I - (1-cos t)/t^2 [w]x + (t - sin t)/t^3 [w]x^2)

Pinhole (4,) intrinsics only; the Brown-Conrady (8,) and optimizable-
intrinsics paths keep the autodiff fallback (sara_tpu.ba.core._jacobians).
Validated against jacfwd to 1e-4 in tests/test_ba.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _so3_exp_and_jr(w):
    """R = exp([w]x) (O, 3, 3) and right Jacobian Jr(w) (O, 3, 3) from
    (O, 3) angle-axis vectors — flat component arithmetic."""
    t2 = jnp.sum(w * w, axis=-1)
    t = jnp.sqrt(jnp.maximum(t2, 1e-24))
    small = t2 < 1e-12
    st, ct = jnp.sin(t), jnp.cos(t)
    # Coefficients with small-angle series fallbacks.
    A = jnp.where(small, 1.0 - t2 / 6.0, st / t)               # sin t / t
    B = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - ct) / t2)     # (1-cos)/t^2
    C = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (t - st) / (t2 * t))

    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)

    def hat2(cA, cB):
        """cA * I + cA2 ... helper building M = I + cA [w]x + cB [w]x^2."""
        # [w]x^2 = w w^T - t^2 I
        m00 = 1.0 + cB * (wx * wx - t2)
        m11 = 1.0 + cB * (wy * wy - t2)
        m22 = 1.0 + cB * (wz * wz - t2)
        m01 = cA * (-wz) + cB * wx * wy
        m10 = cA * wz + cB * wx * wy
        m02 = cA * wy + cB * wx * wz
        m20 = cA * (-wy) + cB * wx * wz
        m12 = cA * (-wx) + cB * wy * wz
        m21 = cA * wx + cB * wy * wz
        return jnp.stack([
            jnp.stack([m00, m01, m02], -1),
            jnp.stack([m10, m11, m12], -1),
            jnp.stack([m20, m21, m22], -1),
        ], -2)

    R = hat2(A, B)
    Jr = hat2(-B, C)
    return R, Jr


def pinhole_jacobians(poses, points, intr, cam_idx, pt_idx, uv):
    """Residuals + closed-form Jacobians for pinhole (4,) intrinsics.

    Returns r (O, 2), Jc (O, 2, 6), Jp (O, 2, 3) — unweighted, unmasked
    (the caller applies Huber weights and freeze masks exactly as for the
    autodiff path).
    """
    w = poses[cam_idx, :3]                                     # (O, 3)
    tt = poses[cam_idx, 3:]                                    # (O, 3)
    X = points[pt_idx]                                         # (O, 3)
    R, Jr = _so3_exp_and_jr(w)                                 # (O, 3, 3)
    Xc = jnp.einsum("oij,oj->oi", R, X) + tt
    z = jnp.where(jnp.abs(Xc[:, 2]) < 1e-9, 1e-9, Xc[:, 2])
    x = Xc[:, 0] / z
    y = Xc[:, 1] / z
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    pred = jnp.stack([fx * x + cx, fy * y + cy], -1)
    r = pred - uv

    # dpi/dXc: (O, 2, 3).
    iz = 1.0 / z
    zeros = jnp.zeros_like(iz)
    dpi = jnp.stack([
        jnp.stack([fx * iz, zeros, -fx * x * iz], -1),
        jnp.stack([zeros, fy * iz, -fy * y * iz], -1),
    ], -2)

    # Jp = dpi . R.
    Jp = jnp.einsum("oij,ojk->oik", dpi, R)

    # dXc/dw = -R [X]x Jr: build [X]x Jr without materializing [X]x.
    # ([X]x Jr)_{ik} = sum_j eps_{ijm} X_m Jr_{jk}  ->  rows:
    X0, X1, X2 = X[..., 0], X[..., 1], X[..., 2]
    XxJr = jnp.stack([
        X1[:, None] * Jr[:, 2, :] - X2[:, None] * Jr[:, 1, :],
        X2[:, None] * Jr[:, 0, :] - X0[:, None] * Jr[:, 2, :],
        X0[:, None] * Jr[:, 1, :] - X1[:, None] * Jr[:, 0, :],
    ], -2)                                                     # (O, 3, 3)
    dXc_dw = -jnp.einsum("oij,ojk->oik", R, XxJr)
    Jw = jnp.einsum("oij,ojk->oik", dpi, dXc_dw)               # (O, 2, 3)
    Jc = jnp.concatenate([Jw, dpi], axis=-1)                   # (O, 2, 6)
    return r, Jc, Jp
