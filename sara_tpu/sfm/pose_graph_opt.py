"""Pose-graph optimization (loop closure) over SE(3).

A first-class new subsystem: the reference has NO pose-graph optimizer in
its C++ path (rotation averaging exists only as a Python note,
reference: python/oddkiva/sara/sfm/rotation_averaging.py; SURVEY.md §5
"long-context" analog). Required by BASELINE config 3 (100-frame VO with
loop closure).

Levenberg-Marquardt over absolute poses with relative-pose residuals:
  r_ij = log( T_meas_ij^-1 o T_j o T_i^-1 )  in se(3),
autodiff Jacobians per edge (each touches only two poses), dense normal
equations assembled by scatter-add — graphs of a few hundred keyframes solve
in one small device program; larger graphs fall back to CG on the same
matrix-free products.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sara_tpu.core import lie


class PoseGraphProblem(NamedTuple):
    """poses: (N, 6) angle-axis+t (world->camera). Edges: measured relative
    motions x_j = R_meas x_i + t_meas with weights."""

    poses: jnp.ndarray         # (N, 6)
    edge_i: jnp.ndarray        # (E,) int32
    edge_j: jnp.ndarray        # (E,) int32
    rel_pose: jnp.ndarray      # (E, 6) measured log(T_j T_i^-1)-style packing
    weight: jnp.ndarray        # (E,) scalar information weight
    edge_mask: jnp.ndarray     # (E,)
    pose_fixed: jnp.ndarray    # (N,) bool


def _pose_to_Rt(p6):
    return lie.so3_exp(p6[:3]), p6[3:]


def edge_residual(pose_i, pose_j, meas6):
    """se(3) residual of one edge."""
    Ri, ti = _pose_to_Rt(pose_i)
    Rj, tj = _pose_to_Rt(pose_j)
    Rm, tm = _pose_to_Rt(meas6)
    # T_rel = T_j o T_i^-1 ; residual = log(T_meas^-1 o T_rel).
    Rrel, trel = lie.se3_compose(Rj, tj, *lie.se3_inverse(Ri, ti))
    Rinv, tinv = lie.se3_inverse(Rm, tm)
    Re, te = lie.se3_compose(Rinv, tinv, Rrel, trel)
    return lie.se3_log(Re, te)


def pose_graph_cost(p: PoseGraphProblem):
    def one(i, j, m, w, valid):
        r = edge_residual(p.poses[i], p.poses[j], m)
        return jnp.where(valid, w * jnp.sum(r * r), 0.0)

    return jnp.sum(jax.vmap(one)(p.edge_i, p.edge_j, p.rel_pose,
                                 p.weight, p.edge_mask))


def _edge_jacobians(p: PoseGraphProblem):
    def one(i, j, m, w, valid):
        pi = p.poses[i]
        pj = p.poses[j]
        r = edge_residual(pi, pj, m)
        Ji = jax.jacfwd(edge_residual, argnums=0)(pi, pj, m)
        Jj = jax.jacfwd(edge_residual, argnums=1)(pi, pj, m)
        sw = jnp.sqrt(w) * valid.astype(r.dtype)
        return r * sw, Ji * sw, Jj * sw

    return jax.vmap(one)(p.edge_i, p.edge_j, p.rel_pose, p.weight, p.edge_mask)


def _assemble_dense(p: PoseGraphProblem, r, Ji, Jj):
    """Dense H (6N, 6N) and g (6N,) by scatter-add over edges."""
    N = p.poses.shape[0]
    free = (~p.pose_fixed).astype(r.dtype)
    Ji = Ji * free[p.edge_i][:, None, None]
    Jj = Jj * free[p.edge_j][:, None, None]

    H = jnp.zeros((N, 6, N, 6), r.dtype)
    g = jnp.zeros((N, 6), r.dtype)
    Hii = jnp.einsum("eab,eac->ebc", Ji, Ji)
    Hjj = jnp.einsum("eab,eac->ebc", Jj, Jj)
    Hij = jnp.einsum("eab,eac->ebc", Ji, Jj)
    H = H.at[p.edge_i, :, p.edge_i, :].add(Hii)
    H = H.at[p.edge_j, :, p.edge_j, :].add(Hjj)
    H = H.at[p.edge_i, :, p.edge_j, :].add(Hij)
    H = H.at[p.edge_j, :, p.edge_i, :].add(jnp.swapaxes(Hij, -1, -2))
    g = g.at[p.edge_i].add(-jnp.einsum("eab,ea->eb", Ji, r))
    g = g.at[p.edge_j].add(-jnp.einsum("eab,ea->eb", Jj, r))
    return H.reshape(6 * N, 6 * N), g.reshape(6 * N)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def optimize_pose_graph(p: PoseGraphProblem, max_iters: int = 20,
                        lambda_init: float = 1e-4):
    """LM on the pose graph. Returns (problem with updated poses, info)."""
    N = p.poses.shape[0]

    def step(carry, _):
        prob, lam, cost = carry
        r, Ji, Jj = _edge_jacobians(prob)
        H, g = _assemble_dense(prob, r, Ji, Jj)
        diag = jnp.diag(jnp.diag(H))
        eye = jnp.eye(6 * N, dtype=H.dtype)
        dx = jnp.linalg.solve(H + lam * diag + 1e-8 * eye, g)
        dx = dx.reshape(N, 6)
        dx = jnp.where(prob.pose_fixed[:, None], 0.0, dx)
        cand = prob._replace(poses=prob.poses + dx)
        new_cost = pose_graph_cost(cand)
        accept = new_cost < cost
        prob2 = prob._replace(poses=jnp.where(accept, cand.poses, prob.poses))
        lam2 = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9),
                         jnp.minimum(lam * 4.0, 1e6))
        return (prob2, lam2, jnp.where(accept, new_cost, cost)), new_cost

    cost0 = pose_graph_cost(p)
    (pf, _, cost_f), _ = jax.lax.scan(
        step, (p, jnp.asarray(lambda_init, p.poses.dtype), cost0),
        None, length=max_iters)
    return pf, {"initial_cost": cost0, "final_cost": cost_f}


def relative_pose_to_packing(R, t):
    """Pack a measured relative motion (R, t) as the (E, 6) row expected by
    PoseGraphProblem (angle-axis + t)."""
    w = lie.so3_log(jnp.asarray(R))
    return jnp.concatenate([w, jnp.asarray(t)], axis=-1)
