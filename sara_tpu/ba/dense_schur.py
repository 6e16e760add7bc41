"""Explicit dense Schur-complement bundle adjustment — DENSE_SCHUR, the TPU way.

Replaces the matrix-free Schur+CG solver for small-to-moderate camera counts
(reference: Ceres DENSE_SCHUR in cpp/src/DO/Sara/SfM/BuildingBlocks/
BundleAdjuster.cpp:184-226). The round-3 analysis (NOTES.md) showed the CG
path's floor is gather/scatter row rate: every CG matvec needs per-
observation row passes at ~20-30 ns/row, so 15 CG iterations cost ~0.4-0.7 s
at O=800k regardless of arithmetic.

This solver removes EVERY gather and scatter from the LM iteration:

- observations live in a POINT-MAJOR PADDED layout (P, Sp): all
  observations of a point occupy one row of Sp slots (validity-masked), so
  every point-side reduction (V blocks, bp, back-substitution) is a free
  reshape-sum;
- camera-side interactions go through ONE-HOT MATMULS: with
  E[p,s,c] = [cam(p,s) == c], pose gathers become ``E @ poses`` and the
  camera-side reductions (U blocks, bc) become ``E^T @ cols`` — MXU work
  instead of scatter passes;
- the reduced camera system S = U_d - W V_d^{-1} W^T is built EXPLICITLY:
  per-point dense camera-block columns D_p (6C x 3) come from a batched
  one-hot matmul, and S accumulates as one big MXU contraction
  sum_p (D_p V_p^{-1}) D_p^T over (point, 3) — then ONE dense solve of the
  (6C, 6C) system replaces the whole CG loop. Exact Schur, exact solve,
  better LM steps than 15-iteration inexact CG.

Cost model: the S contraction is 2 * 3P * (6C)^2 FLOPs — MXU-bound and
tiny for C <= 512 (1.4 TFLOP at C=256/P=100k); everything else is a few
bandwidth sweeps over (P*Sp, ~128)-shaped row arrays. Padding inflation
P*Sp/O is bounded by the max track length; ``pack_pt_major`` reports it so
the dispatcher can fall back to the CG path for pathological layouts.

Used automatically by :func:`sara_tpu.ba.bundle_adjust` (plain pinhole
problems, C within ``dense_max_cameras``); the matrix-free CG path remains
for huge C, optimizable intrinsics, Brown-Conrady residuals, and the
sharded/multi-host solvers.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from sara_tpu.ba.jacobian import pinhole_jacobians_gathered


class PtMajorBA(NamedTuple):
    """Point-major padded BA problem (all arrays fixed-shape).

    poses:       (C, 6) angle-axis + translation (world->camera).
    points:      (P, 3).
    intrinsics:  (4,) [fx, fy, cx, cy].
    cam_idx:     (P, Sp) int32 camera of each observation slot.
    uv:          (P, Sp, 2) observed pixels.
    slot_mask:   (P, Sp) bool — valid observation slots.
    pose_free:   (C, 6) float — 1 for FREE pose components.
    point_fixed: (P,) bool.
    """

    poses: jnp.ndarray
    points: jnp.ndarray
    intrinsics: jnp.ndarray
    cam_idx: jnp.ndarray
    uv: jnp.ndarray
    slot_mask: jnp.ndarray
    pose_free: jnp.ndarray
    point_fixed: jnp.ndarray


def _bucket(n: int, lo: int) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def pack_pt_major(p, sp_min: int = 8, chunk: int = 16384):
    """Host-side conversion BAProblem -> (PtMajorBA, stats dict).

    Sorts the valid observations by point and lays them out as (P, Sp)
    padded slots, Sp = power-of-two bucket of the max observations per
    point. Returns the packed problem and {"sp": Sp, "inflation": P*Sp/O}.
    """
    pt = np.asarray(p.pt_idx)
    cam = np.asarray(p.cam_idx)
    uv = np.asarray(p.uv)
    mask = np.asarray(p.obs_mask)
    P = int(p.points.shape[0])
    C = int(p.poses.shape[0])

    pt_v = pt[mask]
    cam_v = cam[mask]
    uv_v = uv[mask]
    counts = np.bincount(pt_v, minlength=P)
    sp_max = int(counts.max()) if len(pt_v) else 1
    Sp = _bucket(max(sp_max, 1), sp_min)

    order = np.argsort(pt_v, kind="stable")
    pt_s = pt_v[order]
    starts = np.zeros(P, np.int64)
    starts[1:] = np.cumsum(counts)[:-1]
    slot = np.arange(len(pt_s)) - starts[pt_s]
    flat = pt_s * Sp + slot

    cam_ps = np.zeros(P * Sp, np.int32)
    uv_ps = np.zeros((P * Sp, 2), uv.dtype)
    m_ps = np.zeros(P * Sp, bool)
    cam_ps[flat] = cam_v[order]
    uv_ps[flat] = uv_v[order]
    m_ps[flat] = True

    # Pad P to a multiple of the chunk size (padded points: no slots,
    # frozen).
    Q = min(chunk, _bucket(P, 256))
    P_pad = ((P + Q - 1) // Q) * Q
    pose_fixed = np.asarray(p.pose_fixed)
    if pose_fixed.ndim == 1:
        pose_fixed = np.broadcast_to(pose_fixed[:, None], (C, 6))
    pose_free = (~pose_fixed).astype(np.asarray(p.poses).dtype)

    def pad(a, fill=0):
        out = np.full((P_pad,) + a.shape[1:], fill, a.dtype)
        out[:P] = a
        return out

    points = pad(np.asarray(p.points))
    point_fixed = pad(np.asarray(p.point_fixed), True)

    ptm = PtMajorBA(
        poses=p.poses,
        points=jnp.asarray(points),
        intrinsics=p.intrinsics,
        cam_idx=jnp.asarray(pad(cam_ps.reshape(P, Sp))),
        uv=jnp.asarray(pad(uv_ps.reshape(P, Sp, 2))),
        slot_mask=jnp.asarray(pad(m_ps.reshape(P, Sp))),
        pose_free=jnp.asarray(pose_free),
        point_fixed=jnp.asarray(point_fixed),
    )
    O = max(int(mask.sum()), 1)
    return ptm, {"sp": Sp, "chunk": Q, "inflation": P_pad * Sp / O,
                 "n_obs": O, "slots": P_pad * Sp}


def pack_pt_major_strata(p, sp_min: int = 4, chunk: int = 16384,
                         min_stratum: int = 4096):
    """Stratified point-major packing: group points by the power-of-two
    bucket of their observation count, merging levels with fewer than
    ``min_stratum`` points upward. Padding inflation then tracks
    sum_p bucket(count_p)/O (~1.3x) instead of being set by the max track
    length (a Poisson tail costs ~4x with a single stratum).

    Returns (strata list of PtMajorBA, pt_ids list, stats dict)."""
    pt = np.asarray(p.pt_idx)
    mask = np.asarray(p.obs_mask)
    P = int(p.points.shape[0])
    counts = np.bincount(pt[mask], minlength=P)
    O = max(int(mask.sum()), 1)
    level = np.maximum(
        sp_min, 1 << np.ceil(np.log2(np.maximum(counts, 1))).astype(np.int64))
    levels = np.sort(np.unique(level))
    # Merge sparse levels upward (each stratum costs a chunk-scan program).
    groups = []
    pending = np.zeros(0, np.int64)
    for i, lv in enumerate(levels):
        ids = np.concatenate([pending, np.nonzero(level == lv)[0]])
        if len(ids) < min_stratum and i + 1 < len(levels):
            pending = ids
            continue
        pending = np.zeros(0, np.int64)
        groups.append((np.sort(ids), int(lv)))
    if len(groups) == 1:
        ptm, stats = pack_pt_major(p, sp_min=sp_min, chunk=chunk)
        return [ptm], [np.arange(P)], {**stats, "sps": [stats["sp"]],
                                       "chunks": [stats["chunk"]]}

    strata, id_lists, sps, chunks, slots = [], [], [], [], 0
    for ids, sp in groups:
        sub = p._replace(
            points=jnp.asarray(np.asarray(p.points)[ids]),
            point_fixed=jnp.asarray(np.asarray(p.point_fixed)[ids]),
        )
        # Remap observation point ids into the stratum's local space;
        # foreign observations are masked out.
        local = np.full(P, 0, np.int64)
        member = np.zeros(P, bool)
        local[ids] = np.arange(len(ids))
        member[ids] = True
        sub = sub._replace(
            pt_idx=jnp.asarray(local[pt].astype(np.int32)),
            obs_mask=jnp.asarray(mask & member[pt]))
        ptm, stats = pack_pt_major(sub, sp_min=sp_min, chunk=chunk)
        strata.append(ptm)
        id_lists.append(ids)
        sps.append(stats["sp"])
        chunks.append(stats["chunk"])
        slots += stats["slots"]
    return strata, id_lists, {"sps": sps, "chunks": chunks, "slots": slots,
                              "n_obs": O, "inflation": slots / O}


def dense_eligible(stats, opts) -> bool:
    """Accept the dense path when the padded-slot inflation is bounded OR
    the whole problem is small in absolute terms (a tiny problem padded to
    one chunk trivially exceeds any relative inflation bound)."""
    return (opts.solver == "dense"
            or stats["slots"] <= max(
                opts.dense_max_inflation * stats["n_obs"], 1_000_000))


# -- chunked kernels ---------------------------------------------------------


def _slot_residual_jac(poses, points_q, intr, cam_q, uv_q, m_q,
                       point_fixed_q, delta, cutoff):
    """Residuals + Huber-weighted Jacobians for one point chunk, all in
    (Q*Sp,) flat component layout. Per-slot pose rows come from a gather
    out of the TINY (C, 6) pose table — small-table gathers vectorize well
    on TPU (measured ~at matmul speed); it is the big-table row gathers
    that are rate-limited (NOTES.md).

    Pose-component freezing is NOT applied here: callers mask the
    aggregated camera-side blocks (U, bc, D) by the (C, 6) free mask —
    algebraically identical and one pass cheaper.

    For f32 problems the outputs are cast to bfloat16: they only feed the
    Gauss-Newton block products (accumulated in f32), and halving the
    bytes of every bulk (N, .) array is the pass-A bottleneck (measured
    memory-pass-bound)."""
    Q, Sp = cam_q.shape
    dt = poses.dtype
    pose_ps = poses[cam_q]                                  # (Q, Sp, 6)
    N = Q * Sp
    w = pose_ps[..., :3].reshape(N, 3)
    tt = pose_ps[..., 3:].reshape(N, 3)
    Xp = jnp.broadcast_to(points_q[:, None, :], (Q, Sp, 3)).reshape(N, 3)
    r, Jcf, Jpf = pinhole_jacobians_gathered(
        w, tt, Xp, intr, uv_q.reshape(N, 2))
    mflat = m_q.reshape(N)
    n = jnp.linalg.norm(r, axis=-1)
    hw = jnp.sqrt(jnp.minimum(1.0, delta / jnp.maximum(n, 1e-12)))
    hw = jnp.where(n > cutoff * delta, 0.0, hw)
    hw = jnp.where(mflat, hw, 0.0).astype(dt)
    r = r * hw[:, None]
    Jcf = Jcf * hw[:, None]
    Jpf = Jpf * hw[:, None]
    ptfree = (~point_fixed_q).astype(dt)
    Jpf = Jpf * jnp.repeat(ptfree, Sp)[:, None]
    if dt == jnp.float32:
        wd = jnp.bfloat16
        return r.astype(wd), Jcf.astype(wd), Jpf.astype(wd)
    return r, Jcf, Jpf


def _vinv3(V, lam, dt):
    """Damped closed-form 3x3 block inverses (adjugate / det)."""
    d = jnp.eye(3, dtype=dt)
    Vd = V + lam * V * d + 1e-8 * d
    a, b, c = Vd[:, 0, 0], Vd[:, 0, 1], Vd[:, 0, 2]
    e, f, g = Vd[:, 1, 0], Vd[:, 1, 1], Vd[:, 1, 2]
    h, i, j = Vd[:, 2, 0], Vd[:, 2, 1], Vd[:, 2, 2]
    A = f * j - g * i
    B = -(e * j - g * h)
    Cc = e * i - f * h
    det = a * A + b * B + c * Cc
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack([
        A, -(b * j - c * i), b * g - c * f,
        B, a * j - c * h, -(a * g - c * e),
        Cc, -(a * i - b * h), a * f - b * e,
    ], axis=-1).reshape(-1, 3, 3)
    return adj / det[:, None, None]


def _chunk_stats(poses, intr, pose_free, lam, chunk_in, delta, cutoff):
    """One chunk's contribution to the reduced camera system.

    Returns (Ucat (C, 42) [U36 | J^T r], S_pt (C6, C6) contribution
    sum_p D V^-1 D^T, rhs_pt (C, 6) contribution sum_p D V^-1 bp)."""
    points_q, cam_q, uv_q, m_q, ptfix_q = chunk_in
    Q, Sp = cam_q.shape
    C = poses.shape[0]
    dt = poses.dtype
    # Bulk working dtype: bf16 for f32 problems (everything below feeds
    # f32-accumulated block products; the pass is memory-pass-bound).
    r, Jcf, Jpf = _slot_residual_jac(poses, points_q, intr, cam_q, uv_q,
                                     m_q, ptfix_q, delta, cutoff)
    wd = r.dtype
    E = (jax.nn.one_hot(cam_q, C, dtype=wd)
         * m_q[..., None].astype(wd))                       # (Q, Sp, C)
    N = Q * Sp
    Jx, Jy = Jcf[:, :6], Jcf[:, 6:]
    Px, Py = Jpf[:, :3], Jpf[:, 3:]
    rx, ry = r[:, 0], r[:, 1]
    # Camera-side columns: U blocks (36) + J^T r (6), one MXU contraction
    # with f32 accumulation.
    u36 = (Jx[:, :, None] * Jx[:, None, :]
           + Jy[:, :, None] * Jy[:, None, :]).reshape(N, 36)
    jtr = Jx * rx[:, None] + Jy * ry[:, None]
    camcols = jnp.concatenate([u36, jtr], axis=1)           # (N, 42)
    Ucat = jnp.einsum("nc,nu->cu", E.reshape(N, C), camcols,
                      preferred_element_type=dt)
    # Pose-component freezing, applied at block level (see
    # _slot_residual_jac): U -> M U M, bc -> M bc, i.e. mask the 42 cols.
    ff = (pose_free[:, :, None] * pose_free[:, None, :]).reshape(C, 36)
    Ucat = Ucat * jnp.concatenate([ff, pose_free], axis=1)
    # Point-side blocks: free reshape-sums (all of a point's slots are in
    # its own row), f32 accumulation via the sum dtype.
    v9 = (Px[:, :, None] * Px[:, None, :]
          + Py[:, :, None] * Py[:, None, :]).reshape(Q, Sp, 9)
    V = jnp.sum(v9, axis=1, dtype=dt).reshape(Q, 3, 3)
    bp = -jnp.sum((Px * rx[:, None] + Py * ry[:, None]).reshape(Q, Sp, 3),
                  axis=1, dtype=dt)                          # (Q, 3)
    Vinv = _vinv3(V, lam, dt)
    # W blocks per slot in K-MAJOR packing W[k*6+j] = B[j,k] = Jc_j Jp_k,
    # so the dense per-point camera columns D reshape FOR FREE into the
    # (rows=(q,k), cols=(j,c)) 2-D operand the S matmul wants — no XLA
    # layout transposes.
    W18 = (Px[:, :, None] * Jx[:, None, :]
           + Py[:, :, None] * Jy[:, None, :]).reshape(Q, Sp, 18)
    D = jnp.einsum("qsc,qsw->qwc", E, W18,
                   preferred_element_type=wd).reshape(Q, 3, 6, C)
    # Freeze mask on the camera-row dimension: W -> M W.
    D = D * pose_free.T[None, None, :, :].astype(wd)
    # H[q,k] = sum_l Vinv[q,k,l] D[q,l] — tiny contraction, kept
    # elementwise (broadcast-multiply + sum) to avoid einsum relayouts.
    H = jnp.sum(Vinv.astype(wd)[:, :, :, None, None]
                * D[:, None, :, :, :], axis=2)
    D2 = D.reshape(3 * Q, 6 * C)
    H2 = H.reshape(3 * Q, 6 * C)
    # The S contraction (2*3Q*(6C)^2 FLOPs) runs on bf16 operands with f32
    # accumulation — S only steers the LM STEP (accept/reject uses the
    # exact f32 cost).
    S_pt = jax.lax.dot_general(
        H2, D2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=dt)
    # S_pt is (6C, 6C) in (j, c)-major packing: index = j * C + c.
    y = jnp.einsum("qkl,ql->qk", Vinv, bp).reshape(3 * Q).astype(wd)
    rhs_pt = jax.lax.dot_general(
        D2, y, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=dt).reshape(6, C).T           # (C, 6)
    return Ucat, S_pt, rhs_pt


def _chunk_backsub(poses, intr, pose_free, dc6, lam, chunk_in, delta,
                   cutoff):
    """Point updates dp = V^-1 (bp - W^T dc) for one chunk (recomputes the
    cheap per-slot quantities; no gathers)."""
    points_q, cam_q, uv_q, m_q, ptfix_q = chunk_in
    Q, Sp = cam_q.shape
    dt = poses.dtype
    r, Jcf, Jpf = _slot_residual_jac(poses, points_q, intr, cam_q, uv_q,
                                     m_q, ptfix_q, delta, cutoff)
    Jx, Jy = Jcf[:, :6], Jcf[:, 6:]
    Px, Py = Jpf[:, :3], Jpf[:, 3:]
    rx, ry = r[:, 0], r[:, 1]
    v9 = (Px[:, :, None] * Px[:, None, :]
          + Py[:, :, None] * Py[:, None, :]).reshape(Q, Sp, 9)
    V = jnp.sum(v9, axis=1, dtype=dt).reshape(Q, 3, 3)
    bp = -jnp.sum((Px * rx[:, None] + Py * ry[:, None]).reshape(Q, Sp, 3),
                  axis=1, dtype=dt)
    Vinv = _vinv3(V, lam, dt)
    W18 = (Jx[:, :, None] * Px[:, None, :]
           + Jy[:, :, None] * Py[:, None, :]).reshape(Q, Sp, 6, 3)
    # Small-table gather of the camera steps (dc6 is (C, 6)).
    dcs = dc6.astype(W18.dtype)[cam_q] * m_q[..., None].astype(W18.dtype)
    z = jnp.einsum("qsjk,qsj->qk", W18, dcs,
                   preferred_element_type=dt)                # (Q, 3)
    dp = jnp.einsum("qkl,ql->qk", Vinv, bp - z)
    return jnp.where(ptfix_q[:, None], 0.0, dp)


def _chunk_cost(poses, points_q, intr, cam_q, uv_q, m_q, delta, cutoff):
    """Robust (trimmed-Huber) cost of one chunk — mirrors ba_cost. Stays
    in the problem dtype end to end (accept/reject must be exact)."""
    Q, Sp = cam_q.shape
    pose_ps = poses[cam_q]                                  # small-table
    N = Q * Sp
    w = pose_ps[..., :3].reshape(N, 3)
    tt = pose_ps[..., 3:].reshape(N, 3)
    Xp = jnp.broadcast_to(points_q[:, None, :], (Q, Sp, 3)).reshape(N, 3)
    r, _, _ = pinhole_jacobians_gathered(w, tt, Xp, intr, uv_q.reshape(N, 2))
    n = jnp.linalg.norm(r, axis=-1)
    quad = 0.5 * n * n
    lin = delta * (n - 0.5 * delta)
    c = jnp.where(n <= delta, quad, lin)
    c = jnp.minimum(c, delta * (cutoff * delta - 0.5 * delta))
    return jnp.sum(jnp.where(m_q.reshape(N), c, 0.0))


def _chunked(arrs, Q):
    """Reshape leading dim P_pad -> (nc, Q) for lax.scan."""
    return jax.tree_util.tree_map(
        lambda a: a.reshape((-1, Q) + a.shape[1:]), arrs)


def ptm_cost(ptm: PtMajorBA, poses, points, delta, cutoff, Q: int):
    chunks = _chunked((points, ptm.cam_idx, ptm.uv, ptm.slot_mask), Q)

    def body(acc, ch):
        pts_q, cam_q, uv_q, m_q = ch
        return acc + _chunk_cost(poses, pts_q, ptm.intrinsics, cam_q, uv_q,
                                 m_q, delta, cutoff), None

    total, _ = jax.lax.scan(body, jnp.zeros((), poses.dtype), chunks)
    return total


@functools.partial(jax.jit, static_argnames=("opts", "Q"))
def dense_schur_bundle_adjust(ptm: PtMajorBA, opts, Q: int):
    """Robust LM with explicit dense Schur solve. Mirrors
    :func:`sara_tpu.ba.core.bundle_adjust` semantics (accept/reject, lambda
    schedule, trimmed Huber) with exact direct steps instead of 15-iteration
    inexact CG."""
    poses, points, info = _lm_loop((ptm,), opts, (Q,), lambda x: x)
    return poses, points[0], info


@functools.partial(jax.jit, static_argnames=("opts", "Qs"))
def dense_schur_bundle_adjust_strata(strata, opts, Qs):
    """Stratified dense-Schur LM: points split by observation count into a
    few (Sp, chunk) strata so padding inflation stays ~1 even with a long
    track-length tail. Returns (poses, per-stratum points tuple, info)."""
    return _lm_loop(tuple(strata), opts, tuple(Qs), lambda x: x)


def _lm_loop(strata, opts, Qs, allreduce):
    """Shared LM loop over one or more point STRATA (each a PtMajorBA with
    its own Sp/chunk; poses/intrinsics/pose_free are shared). ``allreduce``
    combines the per-shard camera-system accumulators (identity
    single-device; lax.psum under shard_map — the ONLY cross-shard
    communication: (6C)^2 + (C,42) + (C,6) floats + one scalar per
    iteration)."""
    p0 = strata[0]
    C = p0.poses.shape[0]
    dt = p0.poses.dtype
    delta = opts.huber_delta
    cutoff = opts.outlier_cutoff
    eyeC = jnp.eye(C, dtype=dt)

    def total_cost(poses, points_t):
        c = jnp.zeros((), dt)
        for ptm, pts, Q in zip(strata, points_t, Qs):
            c = c + ptm_cost(ptm, poses, pts, delta, cutoff, Q)
        return allreduce(c)

    def lm_step(carry, _):
        poses, points_t, lam, cost = carry

        init = (jnp.zeros((C, 42), dt), jnp.zeros((6 * C, 6 * C), dt),
                jnp.zeros((C, 6), dt))
        acc = init
        chunk_sets = []
        for ptm, pts, Q in zip(strata, points_t, Qs):
            chunks = _chunked((pts, ptm.cam_idx, ptm.uv, ptm.slot_mask,
                               ptm.point_fixed), Q)
            chunk_sets.append(chunks)

            def body(a, ch, _ptm=ptm):
                u, s, rh = _chunk_stats(poses, _ptm.intrinsics,
                                        _ptm.pose_free, lam, ch, delta,
                                        cutoff)
                return (a[0] + u, a[1] + s, a[2] + rh), None

            acc, _ = jax.lax.scan(body, acc, chunks)
        Ucat, S_pt, rhs_pt = (allreduce(acc[0]), allreduce(acc[1]),
                              allreduce(acc[2]))

        U = Ucat[:, :36].reshape(C, 6, 6)
        bc = -Ucat[:, 36:]                                   # (C, 6)
        d6 = jnp.eye(6, dtype=dt)
        U_d = U + lam * U * d6 + 1e-8 * d6
        # (j, c)-major packing throughout (matches the S_pt matmul layout).
        S = (jnp.einsum("cd,cji->jcid", eyeC, U_d).reshape(6 * C, 6 * C)
             - S_pt)
        rhs = (bc - rhs_pt).T.reshape(6 * C)
        dc6 = jnp.linalg.solve(S, rhs).reshape(6, C).T * p0.pose_free

        cand_points = []
        for ptm, chunks, Q in zip(strata, chunk_sets, Qs):
            def body_bs(_, ch, _ptm=ptm):
                return None, _chunk_backsub(poses, _ptm.intrinsics,
                                            _ptm.pose_free, dc6, lam, ch,
                                            delta, cutoff)

            _, dp_chunks = jax.lax.scan(body_bs, None, chunks)
            cand_points.append(chunks[0].reshape(-1, 3)
                               + dp_chunks.reshape(-1, 3))
        cand_points = tuple(cand_points)

        cand_poses = poses + dc6
        new_cost = total_cost(cand_poses, cand_points)
        accept = new_cost < cost
        poses2 = jnp.where(accept, cand_poses, poses)
        points2 = tuple(jnp.where(accept, cp, pp)
                        for cp, pp in zip(cand_points, points_t))
        lam2 = jnp.where(accept,
                         jnp.maximum(lam * opts.lambda_down, opts.lambda_min),
                         jnp.minimum(lam * opts.lambda_up, opts.lambda_max))
        cost2 = jnp.where(accept, new_cost, cost)
        return (poses2, points2, lam2, cost2), cost2

    points0 = tuple(ptm.points for ptm in strata)
    cost0 = total_cost(p0.poses, points0)
    (poses_f, points_f, lam_f, cost_f), costs = jax.lax.scan(
        lm_step, (p0.poses, points0, jnp.asarray(opts.lambda_init, dt),
                  cost0),
        None, length=opts.max_iters)
    info = {"initial_cost": cost0, "final_cost": cost_f, "costs": costs,
            "lambda": lam_f}
    return poses_f, points_f, info


@jax.jit
def _session_refresh(strata, ids, poses, points):
    """Swap pose/point VALUES into the resident strata layout as ONE
    device program. The previous per-stratum eager ops (gather, pad,
    concatenate, scatter — ~25 dispatches) each paid this runtime's
    ~27 ms dispatch RTT; measured session re-solve 8.3 s vs 0.9 s for
    the solver itself (BA_BENCH_r5 debugging)."""
    new = []
    for ptm, idv in zip(strata, ids):
        pts = points[idv]
        pad = ptm.points.shape[0] - idv.shape[0]
        if pad:
            pts = jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)])
        new.append(ptm._replace(poses=poses, points=pts))
    return tuple(new)


@functools.partial(jax.jit, static_argnames=("P",))
def _session_scatter(points_t, ids, P):
    """Per-stratum point blocks -> one (P, 3) array, one device program."""
    pts_full = jnp.zeros((P, 3), points_t[0].dtype)
    for idv, pnew in zip(ids, points_t):
        pts_full = pts_full.at[idv].set(pnew[: idv.shape[0]])
    return pts_full


class DenseSchurSession:
    """Device-resident dense-Schur BA: pack ONCE, solve repeatedly.

    ``bundle_adjust`` re-packs the point-major layout on the host and
    re-ships every array to the device on EVERY call; on this runtime's
    ~30 MB/s host->device tunnel that costs ~4x the solver itself at
    C=256/O=800k (BA_BENCH_r4.json: 2.7 vs 11.2 LM iters/s; real PCIe
    moves it in ~2 ms, but the principle stands — the observation layout
    is static across LM restarts and should live on device). The session
    keeps the packed strata device-resident; ``solve`` optionally swaps in
    new pose/point VALUES (tiny (C,6) upload + device-side gathers into
    the strata layout) without touching the layout arrays.

    Mirrors the persistent-solver-state idiom of Ceres' Problem object
    (reference: cpp/src/DO/Sara/SfM/BuildingBlocks/BundleAdjuster.cpp:
    184-226 builds the problem once and iterates in place).
    """

    def __init__(self, p, opts):
        self.opts = opts
        strata, id_lists, stats = pack_pt_major_strata(p, chunk=opts.dense_chunk)
        self.stats = stats
        self.strata = tuple(strata)
        self.Qs = tuple(stats["chunks"])
        self._P = int(p.points.shape[0])
        # Device-resident stratum->global point ids (for value refresh and
        # final unpack scatter, both on device).
        self._ids = [jnp.asarray(ids.astype(np.int32)) for ids in id_lists]

    @property
    def eligible(self) -> bool:
        return dense_eligible(self.stats, self.opts)

    def solve(self, poses=None, points=None, opts=None):
        """Run the LM program on the resident problem. ``poses`` (C, 6) and
        ``points`` (P, 3) override the resident VALUES (layout unchanged).
        Returns (poses, points (P, 3), info)."""
        opts = opts or self.opts
        if poses is not None or points is not None:
            poses_in = jnp.asarray(poses) if poses is not None \
                else self.strata[0].poses
            if points is not None:
                self.strata = _session_refresh(
                    self.strata, tuple(self._ids), poses_in,
                    jnp.asarray(points))
            else:
                # Metadata-only replace (no device ops).
                self.strata = tuple(ptm._replace(poses=poses_in)
                                    for ptm in self.strata)
        poses_f, points_t, info = dense_schur_bundle_adjust_strata(
            self.strata, opts, self.Qs)
        # Keep the solution resident so chained solves continue from it.
        self.strata = tuple(
            ptm._replace(poses=poses_f, points=pts)
            for ptm, pts in zip(self.strata, points_t))
        pts_full = _session_scatter(tuple(points_t), tuple(self._ids),
                                    self._P)
        return poses_f, pts_full, info


def dense_schur_bundle_adjust_sharded(ptm: PtMajorBA, mesh, opts, Q: int,
                                      axis: str = "shard"):
    """Distributed dense-Schur BA: points AND their observations are
    co-partitioned over the mesh BY CONSTRUCTION (the point-major layout
    keeps every observation in its point's row), so all per-point work is
    shard-local. The only communication is the psum of the reduced camera
    system ((6C)^2 + (C,42) + (C,6) floats) and the cost scalar per LM
    iteration; the dense solve runs replicated on every shard.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    spec_pt = P(axis)
    spec_rep = P()
    in_specs = PtMajorBA(
        poses=spec_rep, points=spec_pt, intrinsics=spec_rep,
        cam_idx=spec_pt, uv=spec_pt, slot_mask=spec_pt,
        pose_free=spec_rep, point_fixed=spec_pt)

    # Re-pad the point axis so every shard holds a whole number of chunks.
    P_old = ptm.points.shape[0]
    mult = n * Q
    P_new = ((P_old + mult - 1) // mult) * mult
    if P_new != P_old:
        pad = P_new - P_old

        def padp(a, fill=0):
            f = jnp.full((pad,) + a.shape[1:], fill, a.dtype)
            return jnp.concatenate([a, f], axis=0)

        ptm = ptm._replace(
            points=padp(ptm.points), cam_idx=padp(ptm.cam_idx),
            uv=padp(ptm.uv), slot_mask=padp(ptm.slot_mask),
            point_fixed=padp(ptm.point_fixed, True))

    ptm = jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), ptm,
        in_specs)

    @functools.partial(jax.jit, static_argnames=())
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(in_specs,),
        out_specs=(spec_rep, spec_pt,
                   {"initial_cost": spec_rep, "final_cost": spec_rep,
                    "costs": spec_rep, "lambda": spec_rep}),
        check_vma=False)
    def run(ptm_local):
        poses, points_t, info = _lm_loop((ptm_local,), opts, (Q,),
                                         lambda x: jax.lax.psum(x, axis))
        return poses, points_t[0], info

    poses, points, info = run(ptm)
    return poses, points[:P_old], info
