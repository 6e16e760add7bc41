"""Distributed bundle adjustment over a device mesh.

The genuinely new subsystem relative to the reference (which runs Ceres
single-process, SURVEY.md §5). Two paths:

1. **Dense-Schur shard_map path** (default when eligible, ba/dense_schur.py):
   the point-major padded layout co-partitions points WITH their
   observations by construction (every observation lives in its point's
   row), so all per-point work is shard-local and the only communication
   is the psum of the reduced camera system ((6C)^2 + (C, 42) + (C, 6)
   floats) plus one cost scalar per LM iteration. This is the genuinely
   locality-aware partition.

2. **GSPMD CG fallback** (huge C / distortion / optimizable intrinsics):
   the matrix-free bundle_adjust_cg program jitted with sharded inputs —
   observations and points contiguously sharded, cameras replicated.
   GSPMD inserts the collectives for the segment-sums; note the
   ``y[pt_idx]`` gathers here are NOT locality-aware (a random pt_idx
   makes them cross-shard all-gathers) — correctness is mesh-tested, comm
   volume is what GSPMD derives.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sara_tpu.ba.core import BAProblem, BAOptions, bundle_adjust_cg


def _pad_axis(a, mult: int):
    n = a.shape[0]
    pad = (-n) % mult
    if pad == 0:
        return a
    import jax.numpy as jnp

    fill = jnp.zeros((pad,) + a.shape[1:], a.dtype)
    return jnp.concatenate([a, fill], axis=0)


def shard_ba_problem(prob: BAProblem, mesh: Mesh, axis: str = "shard") -> BAProblem:
    """Place a BAProblem on the mesh: observations + points sharded,
    cameras/intrinsics replicated. Pads shard axes to the mesh size."""
    n = mesh.devices.size
    sharded = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    import jax.numpy as jnp

    p_orig = prob.points.shape[0]
    prob = prob._replace(
        cam_idx=_pad_axis(prob.cam_idx, n),
        pt_idx=_pad_axis(prob.pt_idx, n),
        uv=_pad_axis(prob.uv, n),
        obs_mask=_pad_axis(prob.obs_mask, n) & (
            jnp.arange(_pad_axis(prob.obs_mask, n).shape[0])
            < prob.obs_mask.shape[0]),
        points=_pad_axis(prob.points, n),
        point_fixed=_pad_axis(prob.point_fixed, n),
    )
    # Padded point rows must be frozen to stay inert.
    p_new = prob.points.shape[0]
    prob = prob._replace(
        point_fixed=prob.point_fixed | (jnp.arange(p_new) >= p_orig))

    put = jax.device_put
    return BAProblem(
        poses=put(prob.poses, repl),
        points=put(prob.points, sharded),
        intrinsics=put(prob.intrinsics, repl),
        cam_idx=put(prob.cam_idx, sharded),
        pt_idx=put(prob.pt_idx, sharded),
        uv=put(prob.uv, sharded),
        obs_mask=put(prob.obs_mask, sharded),
        pose_fixed=put(prob.pose_fixed, repl),
        point_fixed=put(prob.point_fixed, sharded),
        intr_free=(None if prob.intr_free is None
                   else put(prob.intr_free, repl)),
    )


@functools.partial(jax.jit, static_argnames=("opts",))
def _ba_jit(prob: BAProblem, opts: BAOptions):
    return bundle_adjust_cg(prob, opts)


def distributed_bundle_adjust(prob: BAProblem, mesh: Mesh,
                              opts: BAOptions = BAOptions(),
                              axis: str = "shard"):
    """Run bundle adjustment with inputs sharded over the mesh (dense-Schur
    shard_map when eligible, GSPMD CG otherwise — module docstring)."""
    eligible = (opts.solver in ("auto", "dense")
                and prob.intr_free is None and prob.intrinsics.shape[0] == 4
                and prob.poses.shape[0] <= opts.dense_max_cameras
                and not isinstance(prob.pt_idx, jax.core.Tracer))
    if eligible:
        from sara_tpu.ba.dense_schur import (
            dense_eligible, dense_schur_bundle_adjust_sharded, pack_pt_major)

        n = int(mesh.devices.size)
        Pn0 = int(prob.points.shape[0])
        chunk = min(opts.dense_chunk, max(64, -(-Pn0 // n)))
        ptm, stats = pack_pt_major(prob, chunk=chunk)
        if dense_eligible(stats, opts):
            poses, points, info = dense_schur_bundle_adjust_sharded(
                ptm, mesh, opts, stats["chunk"], axis)
            Pn = prob.points.shape[0]
            return prob._replace(poses=poses, points=points[:Pn]), info
    sp = shard_ba_problem(prob, mesh, axis)
    with mesh:
        out, info = _ba_jit(sp, opts)
    return out, info
