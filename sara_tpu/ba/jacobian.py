"""Closed-form reprojection Jacobians in flat (O,)-component form.

``jax.vmap(jax.jacfwd(project))`` measured 2.36 s at O=800k on TPU. Root
cause (probe_ba_stages.py + probe_segsum.py): XLA:TPU tiles the last TWO
dimensions of every array to (8, 128), so any (O, small, small) tensor —
the (O, 2, 6) tangent blocks, (O, 3, 3) rotation matrices — is ~98%
padding: gigabytes of physical traffic for tens of logical megabytes.

This module therefore computes the whole chain rule over (O,) component
arrays (rotations and Jacobian blocks as tuples of flat vectors) and
emits the results packed FLAT:

  r   (O, 2)
  Jcf (O, 12)  [i*6 + a]   d r_i / d pose_a   (w then t)
  Jpf (O, 6)   [i*3 + a]   d r_i / d X_a

Math (world->camera pose (w, t), R = exp([w]x), Xc = R X + t):
  dpi/dXc = [[fx/z, 0, -fx x/z], [0, fy/z, -fy y/z]],  x = Xc0/z, ...
  dXc/dt  = I
  dXc/dX  = R
  dXc/dw  = -R [X]x Jr(w)   (right Jacobian of SO(3):
            Jr = I - (1-cos t)/t^2 [w]x + (t - sin t)/t^3 [w]x^2)

Pinhole (4,) intrinsics only; the Brown-Conrady (8,) and optimizable-
intrinsics paths keep the autodiff fallback (sara_tpu.ba.core).
Validated against jacfwd to ~1e-9 relative in tests/test_ba.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def _mat3(rows):
    """3x3 'matrix' as a tuple of 9 flat (O,) components, row-major."""
    return tuple(rows)


def _mat3_mul(A, B):
    """Component (O,)-wise product of two flat 3x3 matrices."""
    return tuple(
        sum(A[3 * i + k] * B[3 * k + j] for k in range(3))
        for i in range(3) for j in range(3))


def _exp_and_jr_flat(wx, wy, wz):
    """R = exp([w]x) and right Jacobian Jr(w) as flat component tuples."""
    t2 = wx * wx + wy * wy + wz * wz
    t = jnp.sqrt(jnp.maximum(t2, 1e-24))
    small = t2 < 1e-12
    st, ct = jnp.sin(t), jnp.cos(t)
    A = jnp.where(small, 1.0 - t2 / 6.0, st / jnp.maximum(t, 1e-24))
    B = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - ct) / jnp.maximum(t2, 1e-24))
    C = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (t - st) / jnp.maximum(t2 * t, 1e-36))

    def build(cA, cB):
        """I + cA [w]x + cB [w]x^2 with [w]x^2 = w w^T - t^2 I."""
        return _mat3([
            1.0 + cB * (wx * wx - t2), cA * (-wz) + cB * wx * wy,
            cA * wy + cB * wx * wz,
            cA * wz + cB * wx * wy, 1.0 + cB * (wy * wy - t2),
            cA * (-wx) + cB * wy * wz,
            cA * (-wy) + cB * wx * wz, cA * wx + cB * wy * wz,
            1.0 + cB * (wz * wz - t2),
        ])

    return build(A, B), build(-B, C)


def pinhole_jacobians(poses, points, intr, cam_idx, pt_idx, uv):
    """Residuals + closed-form Jacobians, flat layouts only.

    Returns r (O, 2), Jcf (O, 12), Jpf (O, 6) — unweighted, unmasked
    (the caller applies Huber weights and freeze masks).
    """
    w = poses[cam_idx, :3]
    tt = poses[cam_idx, 3:]
    Xp = points[pt_idx]
    return pinhole_jacobians_gathered(w, tt, Xp, intr, uv)


def pinhole_jacobians_gathered(w, tt, Xp, intr, uv):
    """Same chain rule from already-gathered per-observation pose/point
    rows (w (O,3), tt (O,3), Xp (O,3)) — the dense-Schur path supplies
    these via one-hot matmuls instead of gathers (ba/dense_schur.py)."""
    X0, X1, X2 = Xp[:, 0], Xp[:, 1], Xp[:, 2]
    R, Jr = _exp_and_jr_flat(w[:, 0], w[:, 1], w[:, 2])

    Xc0 = R[0] * X0 + R[1] * X1 + R[2] * X2 + tt[:, 0]
    Xc1 = R[3] * X0 + R[4] * X1 + R[5] * X2 + tt[:, 1]
    Xc2 = R[6] * X0 + R[7] * X1 + R[8] * X2 + tt[:, 2]
    z = jnp.where(jnp.abs(Xc2) < 1e-9, 1e-9, Xc2)
    iz = 1.0 / z
    x = Xc0 * iz
    y = Xc1 * iz
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    r = jnp.stack([fx * x + cx - uv[:, 0], fy * y + cy - uv[:, 1]], axis=1)

    # dpi/dXc rows (per-component): row0 = fx iz (e0 - x e2),
    # row1 = fy iz (e1 - y e2).
    a0 = fx * iz
    a2 = -fx * x * iz
    b1 = fy * iz
    b2 = -fy * y * iz

    # Jp rows: dpi . R  (Jp[i, a] = dpi[i, :] . R[:, a]).
    Jp0 = [a0 * R[0 + a] + a2 * R[6 + a] for a in range(3)]
    Jp1 = [b1 * R[3 + a] + b2 * R[6 + a] for a in range(3)]

    # M = [X]x Jr   (M_{ik} = (eps_{ijm} X_m) Jr_{jk}).
    M = _mat3([
        X1 * Jr[6] - X2 * Jr[3], X1 * Jr[7] - X2 * Jr[4],
        X1 * Jr[8] - X2 * Jr[5],
        X2 * Jr[0] - X0 * Jr[6], X2 * Jr[1] - X0 * Jr[7],
        X2 * Jr[2] - X0 * Jr[8],
        X0 * Jr[3] - X1 * Jr[0], X0 * Jr[4] - X1 * Jr[1],
        X0 * Jr[5] - X1 * Jr[2],
    ])
    # dXc/dw = -R M.
    G = tuple(-g for g in _mat3_mul(R, M))
    # Jw rows: dpi . G.
    Jw0 = [a0 * G[0 + a] + a2 * G[6 + a] for a in range(3)]
    Jw1 = [b1 * G[3 + a] + b2 * G[6 + a] for a in range(3)]

    # Pack flat: Jcf [i*6 + a] with pose layout (w0 w1 w2 t0 t1 t2);
    # dXc/dt = I so the t-columns are the dpi rows themselves.
    zeros = jnp.zeros_like(a0)
    Jcf = jnp.stack(
        Jw0 + [a0, zeros, a2] + Jw1 + [zeros, b1, b2], axis=1)
    Jpf = jnp.stack(Jp0 + Jp1, axis=1)
    return r, Jcf, Jpf
