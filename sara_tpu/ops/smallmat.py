"""Batched small-matrix determinant / solve without the LU custom call.

XLA:TPU lowers ``jnp.linalg.det`` / ``jnp.linalg.solve`` on batches of tiny
matrices to a LuDecompositionBlock custom call that PINS the layout to
``(..., n, n)`` minor-dims-last; the (8, 128) tile padding of an n=10 matrix
then inflates HBM temporaries ~20x (measured: a (16, 500, 4, 31, 10, 10)
batch wanted 2 x 7.57 GB and OOM'd the chip — the 5-point RANSAC pair
program of the global SfM driver). The reference hits no such issue only
because it runs Eigen on CPU scalars (e.g.
cpp/src/DO/Sara/MultiViewGeometry/MinimalSolvers/NisterFivePointAlgorithm.hpp).

The TPU-native fix: keep the BATCH on the minor (lane) dimension and the
tiny matrix on leading dims — every step is then a (n, n, B)-shaped
elementwise/VPU op with perfect tiling — and do Gauss-Jordan elimination
with partial pivoting in n unrolled static steps. Determinant comes free
as the product of pivots (sign-tracked through the row swaps).
"""

from __future__ import annotations

import jax.numpy as jnp


def det3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form determinant of (..., 3, 3) (avoids the LU path)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def _gauss_jordan(A: jnp.ndarray, B: jnp.ndarray | None):
    """Shared elimination core in batch-last layout.

    A: (..., n, n); B: (..., n, k) or None. Returns (det (...,),
    X (..., n, k) or None). The n elimination steps run as a
    ``fori_loop`` — compile time on the target runtime scales with HLO op
    count, and this core gets vmapped inside already-huge RANSAC programs.
    """
    import jax

    batch = A.shape[:-2]
    n = A.shape[-1]
    a0 = jnp.moveaxis(A.reshape((-1,) + A.shape[-2:]), 0, -1)  # (n, n, Bt)
    Bt = a0.shape[-1]
    has_b = B is not None
    if has_b:
        k = B.shape[-1]
        b0 = jnp.moveaxis(B.reshape((-1, n, k)), 0, -1)        # (n, k, Bt)
    else:
        k = 1
        b0 = jnp.zeros((n, 1, Bt), A.dtype)
    det0 = jnp.ones((Bt,), A.dtype)
    rows = jnp.arange(n)[:, None, None]                        # (n, 1, 1)
    rows2 = jnp.arange(n)[:, None]                             # (n, 1)

    def _swap(mat, step, piv):
        row_s = jax.lax.dynamic_index_in_dim(mat, step, 0, False)  # (c, Bt)
        row_p = jnp.take_along_axis(
            mat, jnp.broadcast_to(piv[None, None, :],
                                  (1, mat.shape[1], Bt)), axis=0)[0]
        out = jnp.where(rows == step, row_p[None], mat)
        out = jnp.where((rows == piv[None, None, :]) & (rows != step)
                        & (piv != step)[None, None, :], row_s[None], out)
        return out, row_p

    def body(step, state):
        a, b, det = state
        col = jnp.abs(jax.lax.dynamic_index_in_dim(a, step, 1, False))
        col = jnp.where(rows2 >= step, col, -1.0)
        piv = jnp.argmax(col, axis=0)                          # (Bt,)
        a, _ = _swap(a, step, piv)
        b, _ = _swap(b, step, piv)
        det = det * jnp.where(piv != step, -1.0, 1.0)
        arow = jax.lax.dynamic_index_in_dim(a, step, 0, False)  # (n, Bt)
        brow = jax.lax.dynamic_index_in_dim(b, step, 0, False)  # (k, Bt)
        pv = jax.lax.dynamic_index_in_dim(arow, step, 0, False)  # (Bt,)
        det = det * pv
        pv_safe = jnp.where(jnp.abs(pv) < 1e-30,
                            jnp.where(pv < 0, -1e-30, 1e-30), pv)
        factor = jax.lax.dynamic_index_in_dim(a, step, 1, False) / pv_safe
        factor = jnp.where(rows2 == step, 0.0, factor)         # (n, Bt)
        a = a - factor[:, None, :] * arow[None]
        b = b - factor[:, None, :] * brow[None]
        return a, b, det

    a, b, det = jax.lax.fori_loop(0, n, body, (a0, b0, det0))
    if not has_b:
        return det.reshape(batch), None
    diag = a[jnp.arange(n), jnp.arange(n), :]                  # (n, Bt)
    diag = jnp.where(jnp.abs(diag) < 1e-30,
                     jnp.where(diag < 0, -1e-30, 1e-30), diag)
    x = b / diag[:, None, :]
    X = jnp.moveaxis(x, -1, 0).reshape(batch + (n, k))
    return det.reshape(batch), X


def batched_det(A: jnp.ndarray) -> jnp.ndarray:
    """Determinant of (..., n, n) small-matrix batches, TPU-layout-friendly."""
    if A.shape[-1] == 3:
        return det3(A)
    det, _ = _gauss_jordan(A, None)
    return det


def batched_solve(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve A X = B for (..., n, n) x (..., n, k) small-matrix batches."""
    _, X = _gauss_jordan(A, B)
    return X


def inv2(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of (..., 2, 2)."""
    a, b = A[..., 0, 0], A[..., 0, 1]
    c, d = A[..., 1, 0], A[..., 1, 1]
    det = a * d - b * c
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    row0 = jnp.stack([d, -b], axis=-1)
    row1 = jnp.stack([-c, a], axis=-1)
    return jnp.stack([row0, row1], axis=-2) / det[..., None, None]


def inv3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate inverse of (..., 3, 3) — XLA's batched-inverse
    custom call pads each 3x3 to an (8, 128) tile (~100x HBM inflation on
    big point-block batches in BA)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack([
        jnp.stack([A11, A12, A13], axis=-1),
        jnp.stack([A21, A22, A23], axis=-1),
        jnp.stack([A31, A32, A33], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None]


def batched_inv(A: jnp.ndarray) -> jnp.ndarray:
    """Inverse of (..., n, n) small-matrix batches (closed form for
    n <= 3, batch-last Gauss-Jordan otherwise)."""
    n = A.shape[-1]
    if n == 2:
        return inv2(A)
    if n == 3:
        return inv3(A)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    _, X = _gauss_jordan(A, eye)
    return X
