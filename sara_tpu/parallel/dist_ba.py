"""Distributed bundle adjustment over a device mesh.

The genuinely new subsystem relative to the reference (which runs Ceres
single-process, SURVEY.md §5): the Schur-complement LM solver of
``sara_tpu.ba.core`` is already matrix-free over gather/segment-sum
products, so distribution is expressed with ``jax.sharding``:

- observations (cam_idx / pt_idx / uv / obs_mask) are sharded over the mesh
  "shard" axis,
- points are sharded over the same axis (their 3x3 V blocks stay local to
  the shard that owns the point's observations in a locality-aware
  partition),
- camera parameters / 6x6 U blocks are replicated; partial per-shard
  camera-block contributions are combined by the all-reduces XLA inserts
  for the segment-sums (psum over ICI).

``distributed_bundle_adjust`` jits the *same* bundle_adjust program with
sharded inputs — GSPMD propagates the shardings and inserts collectives;
there is no separate "distributed" numeric code path to keep in sync.
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
    """Run bundle adjustment with inputs sharded over the mesh."""
    sp = shard_ba_problem(prob, mesh, axis)
    with mesh:
        out, info = _ba_jit(sp, opts)
    return out, info
