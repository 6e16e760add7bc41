"""Bundle adjustment core: robust reprojection LM with Schur-complement PCG.

TPU-native replacement for the reference's Ceres-based bundle adjuster
(reference: cpp/src/DO/Sara/SfM/BuildingBlocks/BundleAdjuster.hpp:33-100,
BundleAdjuster.cpp:162-226 — DENSE_SCHUR, Huber(4 px), <=200 iterations;
residual per observation per BAReprojectionError.hpp:20-82; parameterization:
angle-axis + translation (6) per camera, 3 per point, intrinsics frozen by
the odometry pipeline).

Design (TPU-first, not a port):
- residuals and Jacobians: one vmapped autodiff program over the observation
  array (struct-of-arrays with a validity mask),
- robustness: Huber via IRLS scaling of residual/Jacobian rows,
- normal equations solved by the Schur complement on the reduced camera
  system, matrix-free: S x = U x - W V^-1 W^T x is evaluated with
  gather / segment-sum, so the same code path shards over a device mesh
  (points and observations partitioned; camera blocks reduced with psum),
- block-Jacobi preconditioned CG on the reduced system (fixed iteration
  count, jit-friendly), then back-substitution for the points,
- LM trust region with accept/reject expressed as ``where`` selects.

Everything is fixed-shape; padded cameras/points/observations carry masks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sara_tpu.core import lie


class BAProblem(NamedTuple):
    """Fixed-shape bundle adjustment state.

    poses:      (C, 6) angle-axis + translation, world->camera.
    points:     (P, 3) scene points.
    intrinsics: (4,) shared pinhole [fx, fy, cx, cy], or (8,)
                [fx, fy, cx, cy, k1, k2, p1, p2] for a Brown-Conrady
                distortion-aware residual (same distortion convention as
                :class:`sara_tpu.core.cameras.BrownConrady`; reference:
                MultiViewGeometry/Calibration/PinholeCameraReprojectionError.hpp).
    cam_idx:    (O,) int32 camera of each observation.
    pt_idx:     (O,) int32 point of each observation.
    uv:         (O, 2) observed pixels.
    obs_mask:   (O,) bool.
    pose_fixed: (C,) bool — frozen cameras (gauge) — or (C, 6) bool to
                freeze individual pose components (e.g. one translation
                coordinate of the second camera pins the monocular scale).
    point_fixed:(P,) bool — frozen points.
    intr_free:  optional (Ki,) bool — which intrinsics components to
                OPTIMIZE (the reference packs intrinsics as a parameter
                block, BundleAdjuster.cpp:162-210). None (default) keeps
                intrinsics constant, exactly the classic pipeline behavior.
    """

    poses: jnp.ndarray
    points: jnp.ndarray
    intrinsics: jnp.ndarray
    cam_idx: jnp.ndarray
    pt_idx: jnp.ndarray
    uv: jnp.ndarray
    obs_mask: jnp.ndarray
    pose_fixed: jnp.ndarray
    point_fixed: jnp.ndarray
    intr_free: jnp.ndarray | None = None


class BAOptions(NamedTuple):
    max_iters: int = 50
    cg_iters: int = 30
    huber_delta: float = 4.0       # pixels (reference: Huber(4 px))
    outlier_cutoff: float = 6.0    # residuals > cutoff*delta get zero weight
                                   # (trimmed Huber; disable with jnp.inf)
    lambda_init: float = 1e-3
    lambda_up: float = 4.0
    lambda_down: float = 0.5
    lambda_min: float = 1e-9
    lambda_max: float = 1e6
    # Solver selection: "auto" uses the explicit dense-Schur direct solver
    # (ba/dense_schur.py — no gathers/scatters/CG) for plain pinhole
    # problems with <= dense_max_cameras cameras and a bounded point-major
    # padding inflation; "cg" forces the matrix-free Schur+PCG path
    # (sharded/multi-host solvers and huge C), "dense" forces dense.
    solver: str = "auto"
    dense_max_cameras: int = 512
    dense_chunk: int = 16384
    dense_max_inflation: float = 8.0


def _project(intr, pose6, X):
    """Projection of world point X through pose (angle-axis, t).

    intr is (4,) pinhole or (8,) pinhole + Brown-Conrady distortion
    ``x_d = x (1 + k1 r^2 + k2 r^4) + (r^2 I + 2 x x^T) p`` (the same
    convention as core.cameras.BrownConrady.distort)."""
    w, t = pose6[:3], pose6[3:]
    R = lie.so3_exp(w)
    Xc = R @ X + t
    z = jnp.where(jnp.abs(Xc[2]) < 1e-9, 1e-9, Xc[2])
    x = Xc[0] / z
    y = Xc[1] / z
    if intr.shape[0] >= 8:
        k1, k2, p1, p2 = intr[4], intr[5], intr[6], intr[7]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * k2)
        tx = r2 * p1 + 2.0 * x * (x * p1 + y * p2)
        ty = r2 * p2 + 2.0 * y * (x * p1 + y * p2)
        x, y = x * radial + tx, y * radial + ty
    return jnp.stack([intr[0] * x + intr[2], intr[1] * y + intr[3]]), Xc[2]


def project_obs(p: BAProblem):
    """Project every observation; returns (pred (O,2), depth (O,))."""
    def one(ci, pi):
        return _project(p.intrinsics, p.poses[ci], p.points[pi])

    return jax.vmap(one)(p.cam_idx, p.pt_idx)


def _residuals(p: BAProblem):
    pred, depth = project_obs(p)
    r = pred - p.uv
    return jnp.where(p.obs_mask[:, None], r, 0.0), depth


def _huber_weights(r: jnp.ndarray, delta: float, mask, cutoff: float = jnp.inf):
    """sqrt IRLS weights for the (trimmed) Huber loss on the residual norm."""
    n = jnp.linalg.norm(r, axis=-1)
    w = jnp.sqrt(jnp.minimum(1.0, delta / jnp.maximum(n, 1e-12)))
    w = jnp.where(n > cutoff * delta, 0.0, w)
    return jnp.where(mask, w, 0.0)


def ba_cost(p: BAProblem, huber_delta: float = 4.0,
            cutoff: float = jnp.inf):
    """Robust total cost (trimmed Huber on the residual norm)."""
    r, _ = _residuals(p)
    n = jnp.linalg.norm(r, axis=-1)
    quad = 0.5 * n * n
    lin = huber_delta * (n - 0.5 * huber_delta)
    c = jnp.where(n <= huber_delta, quad, lin)
    # Plateau beyond the trim point so trimmed observations do not steer
    # accept/reject decisions.
    c = jnp.minimum(c, huber_delta * (cutoff * huber_delta - 0.5 * huber_delta))
    return jnp.sum(jnp.where(p.obs_mask, c, 0.0))


def _pose_free(p: BAProblem):
    """(C, 6) float mask of FREE pose components (pose_fixed may be (C,)
    whole-camera booleans or (C, 6) per-component booleans)."""
    pf = p.pose_fixed
    if pf.ndim == 1:
        pf = jnp.broadcast_to(pf[:, None], (pf.shape[0], 6))
    return (~pf).astype(p.poses.dtype)


def _jacobians(p: BAProblem, delta: float, cutoff: float = jnp.inf):
    """Per-observation weighted residuals and Jacobian blocks.

    Returns r (O, 2), Jc (O, 2, 6), Jp (O, 2, 3), Ji (O, 2, Ki) or None —
    all Huber-weighted and masked (fixed params get zero columns).

    This is the autodiff path, used for Brown-Conrady (8,) residuals and
    optimizable intrinsics; plain pinhole problems take
    :func:`_jacobians_flat` (closed form, flat layouts — the rank-3
    per-observation tensors here are tile-padded ~85x on TPU).
    """
    want_intr = p.intr_free is not None

    def res_one(intr, pose6, X, uv):
        pred, _ = _project(intr, pose6, X)
        return pred - uv

    def one(ci, pi, uv):
        pose6 = p.poses[ci]
        X = p.points[pi]
        r = res_one(p.intrinsics, pose6, X, uv)
        Jc = jax.jacfwd(res_one, argnums=1)(p.intrinsics, pose6, X, uv)
        Jp = jax.jacfwd(res_one, argnums=2)(p.intrinsics, pose6, X, uv)
        if want_intr:
            Ji = jax.jacfwd(res_one, argnums=0)(p.intrinsics, pose6, X, uv)
            return r, Jc, Jp, Ji
        return r, Jc, Jp, jnp.zeros(())

    r, Jc, Jp, Ji = jax.vmap(one)(p.cam_idx, p.pt_idx, p.uv)
    w = _huber_weights(r, delta, p.obs_mask, cutoff)
    r = r * w[:, None]
    Jc = Jc * w[:, None, None]
    Jp = Jp * w[:, None, None]
    # Zero out columns of fixed camera components / points.
    cam_free = _pose_free(p)[p.cam_idx]                      # (O, 6)
    pt_free = (~p.point_fixed)[p.pt_idx].astype(r.dtype)
    Jc = Jc * cam_free[:, None, :]
    Jp = Jp * pt_free[:, None, None]
    if want_intr:
        Ji = Ji * w[:, None, None]
        Ji = Ji * p.intr_free.astype(r.dtype)[None, None, :]
    else:
        Ji = None
    return r, Jc, Jp, Ji


def _jacobians_closed_form(p: BAProblem, delta: float,
                           cutoff: float = jnp.inf):
    """Closed-form pinhole Jacobians (no autodiff program), Huber-weighted
    and freeze-masked, in the einsum solver's block shapes:
    r (O, 2), Jc (O, 2, 6), Jp (O, 2, 3)."""
    from sara_tpu.ba.jacobian import pinhole_jacobians

    r, Jcf, Jpf = pinhole_jacobians(p.poses, p.points, p.intrinsics,
                                    p.cam_idx, p.pt_idx, p.uv)
    O = r.shape[0]
    Jc = Jcf.reshape(O, 2, 6)
    Jp = Jpf.reshape(O, 2, 3)
    w = _huber_weights(r, delta, p.obs_mask, cutoff)
    r = r * w[:, None]
    Jc = Jc * w[:, None, None]
    Jp = Jp * w[:, None, None]
    cam_free = _pose_free(p)[p.cam_idx]                        # (O, 6)
    pt_free = (~p.point_fixed)[p.pt_idx].astype(r.dtype)
    Jc = Jc * cam_free[:, None, :]
    Jp = Jp * pt_free[:, None, None]
    return r, Jc, Jp


def _gauss_newton_blocks(p: BAProblem, r, Jc, Jp):
    """Assemble the block operators of the (undamped) normal equations."""
    C = p.poses.shape[0]
    P = p.points.shape[0]
    # U: (C, 6, 6); V: (P, 3, 3); per-obs W: (O, 6, 3).
    U = jax.ops.segment_sum(jnp.einsum("oia,oib->oab", Jc, Jc), p.cam_idx, C)
    V = jax.ops.segment_sum(jnp.einsum("oia,oib->oab", Jp, Jp), p.pt_idx, P)
    Wo = jnp.einsum("oia,oib->oab", Jc, Jp)
    bc = -jax.ops.segment_sum(jnp.einsum("oia,oi->oa", Jc, r), p.cam_idx, C)
    bp = -jax.ops.segment_sum(jnp.einsum("oia,oi->oa", Jp, r), p.pt_idx, P)
    return U, V, Wo, bc, bp


# (A fully "flat-layout" solver variant — per-observation quantities as
# (O, k) column arrays with hand-written column arithmetic — was built and
# A/B-measured in-process at C=256/O=800k: 1248 ms/LM-iter vs 705 for the
# einsum solver. XLA fuses the einsum program better than 36-column
# jnp.stack chains. What DOES win is the hybrid below: closed-form
# Jacobians (no jacfwd) reshaped into the einsum solver's (O, 2, 6)
# blocks — 644 ms/LM-iter, best of the three.)


def _damp(M, lam):
    """LM damping: M + lam * diag(M) + eps I (per block)."""
    d = jnp.eye(M.shape[-1], dtype=M.dtype)
    diag = M * d
    return M + lam * diag + 1e-8 * d


def _inv_blocks(M):
    # Closed-form / batch-last small inverses: jnp.linalg.inv's batched LU
    # pads each 3x3 point block to an (8, 128) tile — ~100x HBM inflation
    # on the (P, 3, 3) V blocks of large problems.
    from sara_tpu.ops.smallmat import batched_inv

    return batched_inv(M)


def _schur_matvec(x, U_d, Vinv, Wo, cam_idx, pt_idx, C, P):
    """S x = U_d x - W V^-1 W^T x, matrix-free over observations."""
    Ux = jnp.einsum("cab,cb->ca", U_d, x)
    WT_x = jnp.einsum("oab,oa->ob", Wo, x[cam_idx])          # (O, 3)
    VWT_x = jax.ops.segment_sum(WT_x, pt_idx, P)              # (P, 3)
    y = jnp.einsum("pab,pb->pa", Vinv, VWT_x)                 # (P, 3)
    Wy = jnp.einsum("oab,ob->oa", Wo, y[pt_idx])              # (O, 6)
    WVWT_x = jax.ops.segment_sum(Wy, cam_idx, C)              # (C, 6)
    return Ux - WVWT_x


def _pcg(matvec, b, Minv_blocks, iters: int):
    """Block-Jacobi preconditioned CG over (C, 6) unknowns."""
    precond = lambda v: jnp.einsum("cab,cb->ca", Minv_blocks, v)
    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    d = z
    rz = jnp.sum(r * z)

    def body(_, state):
        x, r, d, rz = state
        Ad = matvec(d)
        dAd = jnp.sum(d * Ad)
        alpha = rz / jnp.where(jnp.abs(dAd) < 1e-20, 1e-20, dAd)
        x2 = x + alpha * d
        r2 = r - alpha * Ad
        z2 = precond(r2)
        rz2 = jnp.sum(r2 * z2)
        beta = rz2 / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
        d2 = z2 + beta * d
        # Guard stagnation: if rz2 ~ 0, keep x.
        keep = rz2 < 1e-30
        return (jnp.where(keep, x, x2), jnp.where(keep, r, r2),
                jnp.where(keep, d, d2), jnp.where(keep, rz, rz2))

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, d, rz))
    return x


def _tree_dot(a, b):
    return sum(jnp.vdot(x, y) for x, y in
               zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


def _pcg_tree(matvec, b, precond, iters: int):
    """Preconditioned CG over an arbitrary pytree of unknowns."""
    zero = jax.tree_util.tree_map(jnp.zeros_like, b)
    x = zero
    r = b
    z = precond(r)
    d = z
    rz = _tree_dot(r, z)
    axpy = lambda a, u, v: jax.tree_util.tree_map(
        lambda uu, vv: uu + a * vv, u, v)

    def body(_, state):
        x, r, d, rz = state
        Ad = matvec(d)
        dAd = _tree_dot(d, Ad)
        alpha = rz / jnp.where(jnp.abs(dAd) < 1e-20, 1e-20, dAd)
        x2 = axpy(alpha, x, d)
        r2 = axpy(-alpha, r, Ad)
        z2 = precond(r2)
        rz2 = _tree_dot(r2, z2)
        beta = rz2 / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
        d2 = axpy(beta, z2, d)
        keep = rz2 < 1e-30
        sel = lambda a, b2: jax.tree_util.tree_map(
            lambda u, v: jnp.where(keep, u, v), a, b2)
        return sel(x, x2), sel(r, r2), sel(d, d2), jnp.where(keep, rz, rz2)

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, d, rz))
    return x


def _solve_lm(p: BAProblem, r, Jc, Jp, Ji, lam, opts: BAOptions):
    """One damped normal-equation solve.

    Returns (dpose (C,6), dpoint (P,3), dintr (Ki,) or None). When
    ``p.intr_free`` is set, the shared intrinsics vector joins the reduced
    camera system as one extra global block (its Hessian rows/columns are
    accumulated over ALL observations), so the matrix-free Schur + PCG
    machinery covers self-calibrating BA without a dense assemble."""
    C = p.poses.shape[0]
    P = p.points.shape[0]
    U, V, Wo, bc, bp = _gauss_newton_blocks(p, r, Jc, Jp)
    U_d = _damp(U, lam)
    V_d = _damp(V, lam)
    Vinv = _inv_blocks(V_d)
    Uinv = _inv_blocks(U_d)
    cam_idx, pt_idx = p.cam_idx, p.pt_idx

    if Ji is None:
        # Classic path: cameras only in the reduced system.
        Vb = jnp.einsum("pab,pb->pa", Vinv, bp)
        Wv = jnp.einsum("oab,ob->oa", Wo, Vb[pt_idx])
        rhs = bc - jax.ops.segment_sum(Wv, cam_idx, C)
        matvec = lambda x: _schur_matvec(x, U_d, Vinv, Wo, cam_idx, pt_idx, C, P)
        dc = _pcg(matvec, rhs, Uinv, opts.cg_iters)
        WTdc = jnp.einsum("oab,oa->ob", Wo, dc[cam_idx])
        di = None
    else:
        Ki = p.intrinsics.shape[0]
        Wi = jnp.einsum("oia,oib->oab", Ji, Jp)               # (O, Ki, 3)
        U_ii = jnp.sum(jnp.einsum("oia,oib->oab", Ji, Ji), axis=0)
        U_ci = jax.ops.segment_sum(jnp.einsum("oia,oib->oab", Jc, Ji),
                                   cam_idx, C)                # (C, 6, Ki)
        bi = -jnp.sum(jnp.einsum("oia,oi->oa", Ji, r), axis=0)
        U_ii_d = _damp(U_ii, lam)
        U_ii_inv = jnp.linalg.inv(U_ii_d)

        Vb = jnp.einsum("pab,pb->pa", Vinv, bp)
        rhs_c = bc - jax.ops.segment_sum(
            jnp.einsum("oab,ob->oa", Wo, Vb[pt_idx]), cam_idx, C)
        rhs_i = bi - jnp.sum(jnp.einsum("oab,ob->oa", Wi, Vb[pt_idx]), axis=0)

        def matvec(x):
            xc, xi = x
            tp = (jnp.einsum("oab,oa->ob", Wo, xc[cam_idx])
                  + jnp.einsum("oab,oa->ob", Wi, jnp.broadcast_to(
                      xi, (Wi.shape[0], Ki))))
            yp = jnp.einsum("pab,pb->pa", Vinv,
                            jax.ops.segment_sum(tp, pt_idx, P))
            out_c = (jnp.einsum("cab,cb->ca", U_d, xc)
                     + jnp.einsum("cak,k->ca", U_ci, xi)
                     - jax.ops.segment_sum(
                         jnp.einsum("oab,ob->oa", Wo, yp[pt_idx]), cam_idx, C))
            out_i = (jnp.einsum("cak,ca->k", U_ci, xc)
                     + U_ii_d @ xi
                     - jnp.sum(jnp.einsum("oab,ob->oa", Wi, yp[pt_idx]),
                               axis=0))
            return out_c, out_i

        precond = lambda v: (jnp.einsum("cab,cb->ca", Uinv, v[0]),
                             U_ii_inv @ v[1])
        dc, di = _pcg_tree(matvec, (rhs_c, rhs_i), precond, opts.cg_iters)
        di = jnp.where(p.intr_free, di, 0.0)
        WTdc = (jnp.einsum("oab,oa->ob", Wo, dc[cam_idx])
                + jnp.einsum("oab,oa->ob", Wi, jnp.broadcast_to(
                    di, (Wi.shape[0], Ki))))

    # Back-substitute points: dp = V^-1 (bp - W^T dc).
    WTdc_p = jax.ops.segment_sum(WTdc, pt_idx, P)
    dp = jnp.einsum("pab,pb->pa", Vinv, bp - WTdc_p)
    # Freeze masks.
    dc = dc * _pose_free(p)
    dp = jnp.where(p.point_fixed[:, None], 0.0, dp)
    return dc, dp, di


def bundle_adjust(p: BAProblem, opts: BAOptions = BAOptions()):
    """Robust LM bundle adjustment. Returns (problem, info dict).

    Dispatches to the explicit dense-Schur solver (ba/dense_schur.py) when
    eligible (host context, plain pinhole, moderate camera count), else to
    the matrix-free Schur+PCG program (:func:`bundle_adjust_cg`)."""
    if p.points.shape[0] == 0 or p.uv.shape[0] == 0:
        # Degenerate problem (nothing survived upstream filtering): no-op.
        z = jnp.zeros((), p.poses.dtype)
        return p, {"initial_cost": z, "final_cost": z,
                   "costs": jnp.zeros((opts.max_iters,), p.poses.dtype),
                   "lambda": jnp.asarray(opts.lambda_init, p.poses.dtype)}
    eligible = (opts.solver in ("auto", "dense")
                and p.intr_free is None and p.intrinsics.shape[0] == 4
                and p.poses.shape[0] <= opts.dense_max_cameras
                and not isinstance(p.pt_idx, jax.core.Tracer))
    if eligible:
        import numpy as np

        from sara_tpu.ba.dense_schur import (dense_eligible,
                                             dense_schur_bundle_adjust_strata,
                                             pack_pt_major_strata)

        strata, id_lists, stats = pack_pt_major_strata(
            p, chunk=opts.dense_chunk)
        if dense_eligible(stats, opts):
            Qs = tuple(stats["chunks"])
            poses, points_t, info = dense_schur_bundle_adjust_strata(
                tuple(strata), opts, Qs)
            P = p.points.shape[0]
            pts = np.array(np.asarray(p.points), copy=True)
            for ids, pnew in zip(id_lists, points_t):
                pts[ids] = np.asarray(pnew)[:len(ids)]
            return p._replace(poses=poses, points=jnp.asarray(pts)), info
    return bundle_adjust_cg(p, opts)


@functools.partial(jax.jit, static_argnames=("opts",))
def bundle_adjust_cg(p: BAProblem, opts: BAOptions = BAOptions()):
    """Matrix-free Schur+PCG LM program (jittable / shardable)."""

    fast = p.intr_free is None and p.intrinsics.shape[0] == 4

    def step(carry, _):
        prob, lam, cost = carry
        if fast:
            r, Jc, Jp = _jacobians_closed_form(prob, opts.huber_delta,
                                               opts.outlier_cutoff)
            Ji = None
        else:
            r, Jc, Jp, Ji = _jacobians(prob, opts.huber_delta,
                                       opts.outlier_cutoff)
        dc, dp, di = _solve_lm(prob, r, Jc, Jp, Ji, lam, opts)
        cand = prob._replace(poses=prob.poses + dc, points=prob.points + dp)
        if di is not None:
            cand = cand._replace(intrinsics=prob.intrinsics + di)
        new_cost = ba_cost(cand, opts.huber_delta, opts.outlier_cutoff)
        accept = new_cost < cost
        prob2 = prob._replace(
            poses=jnp.where(accept, cand.poses, prob.poses),
            points=jnp.where(accept, cand.points, prob.points),
            intrinsics=jnp.where(accept, cand.intrinsics, prob.intrinsics))
        lam2 = jnp.where(accept,
                         jnp.maximum(lam * opts.lambda_down, opts.lambda_min),
                         jnp.minimum(lam * opts.lambda_up, opts.lambda_max))
        cost2 = jnp.where(accept, new_cost, cost)
        return (prob2, lam2, cost2), cost2

    cost0 = ba_cost(p, opts.huber_delta, opts.outlier_cutoff)
    (pf, lam_f, cost_f), costs = jax.lax.scan(
        step, (p, jnp.asarray(opts.lambda_init, p.poses.dtype), cost0),
        None, length=opts.max_iters)
    info = {"initial_cost": cost0, "final_cost": cost_f, "costs": costs,
            "lambda": lam_f}
    return pf, info
