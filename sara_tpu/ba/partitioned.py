"""Keyframe/map-block partitioned bundle adjustment (BASELINE config 5).

City-scale collections exceed both a single dense-Schur system (C > ~512)
and, eventually, one chip's memory. The scalable structure used here:

- cameras are partitioned into contiguous KEYFRAME BLOCKS (temporal
  locality: consecutive views share structure);
- a block's sub-problem contains its cameras with ALL of their
  observations (a camera never loses constraints), and therefore every
  point those cameras see; each point is OWNED by the block holding most
  of its observations and enters other blocks as a frozen boundary copy
  that anchors them in the global frame;
- every block is an independent dense-Schur problem of identical padded
  shape, so one ``jax.vmap`` of the LM loop solves ALL blocks in a single
  program — and sharding the block axis over a device mesh runs them on
  separate chips with ZERO inter-block communication inside a sweep
  (block-Jacobi domain decomposition);
- a few outer SWEEPS re-exchange boundary poses between blocks (host-side
  scatter of the block-owned updates), which is the only cross-block
  traffic: O(C * 6) floats per sweep, independent of points/observations.

The reference has no counterpart (Ceres solves one global problem,
cpp/src/DO/Sara/SfM/BuildingBlocks/BundleAdjuster.cpp); this is the SURVEY
§5 "N >= 2 hosts" design: blocks map onto hosts/chips, sweeps amortize the
tiny boundary exchange.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from sara_tpu.ba.core import BAProblem, BAOptions
from sara_tpu.ba.dense_schur import _lm_loop, PtMajorBA, _bucket


class BlockPlan(NamedTuple):
    """Host-side partition plan (numpy)."""

    n_blocks: int
    block_of_cam: np.ndarray       # (C,) owning block of each camera
    block_of_pt: np.ndarray        # (P,) owning block of each point
    cam_local: np.ndarray          # (B, Cb) global camera id per local slot
    cam_owned: np.ndarray          # (B, Cb) bool — valid (non-pad) slots
    pt_local: np.ndarray           # (B, Pb) global point id per local slot
    pt_valid: np.ndarray           # (B, Pb) bool — valid (non-pad) slots
    pt_owned: np.ndarray           # (B, Pb) bool — block updates this point


def plan_blocks(prob: BAProblem, n_blocks: int) -> BlockPlan:
    """Contiguous keyframe camera blocks; every block carries ALL points
    its cameras observe, owning those where it holds the most
    observations (ties toward the middle observing camera's block)."""
    C = int(prob.poses.shape[0])
    P = int(prob.points.shape[0])
    cam_idx = np.asarray(prob.cam_idx)
    pt_idx = np.asarray(prob.pt_idx)
    mask = np.asarray(prob.obs_mask)
    block_of_cam = np.minimum(
        np.arange(C) * n_blocks // C, n_blocks - 1).astype(np.int64)

    votes = np.zeros((P, n_blocks), np.int64)
    np.add.at(votes, (pt_idx[mask], block_of_cam[cam_idx[mask]]), 1)
    order = np.argsort(pt_idx[mask], kind="stable")
    pts_s = pt_idx[mask][order]
    cams_s = cam_idx[mask][order]
    counts = np.bincount(pts_s, minlength=P)
    starts = np.zeros(P, np.int64)
    starts[1:] = np.cumsum(counts)[:-1]
    mid_block = np.full(P, -1, np.int64)
    seen = counts > 0
    mid_idx = starts[seen] + counts[seen] // 2
    mid_block[seen] = block_of_cam[cams_s[mid_idx]]
    best = votes.max(axis=1, initial=0)
    is_tied_mid = seen & (votes[np.arange(P),
                                np.clip(mid_block, 0, n_blocks - 1)] == best)
    block_of_pt = np.where(is_tied_mid, mid_block, np.argmax(votes, axis=1))
    block_of_pt[~seen] = -1   # unobserved points

    # Block observation set: its cameras' obs PLUS its owned points'
    # foreign obs. Every FREE variable (own cameras, owned points) then
    # sees all of its constraints, so a block solve with the rest frozen
    # is exact coordinate descent on the global objective — cost can
    # never increase across sweeps.
    cam_lists, camown_lists, pt_lists, own_lists = [], [], [], []
    for b in range(n_blocks):
        own = np.nonzero(block_of_cam == b)[0]
        sel = mask & ((block_of_cam[cam_idx] == b)
                      | (block_of_pt[pt_idx] == b))
        cams_seen = np.unique(cam_idx[sel])
        boundary = cams_seen[block_of_cam[cams_seen] != b]
        cams = np.concatenate([own, boundary])
        cam_lists.append(cams)
        camown_lists.append(np.concatenate(
            [np.ones(len(own), bool), np.zeros(len(boundary), bool)]))
        pts = np.unique(pt_idx[sel])
        pt_lists.append(pts)
        own_lists.append(block_of_pt[pts] == b)

    Cb = _bucket(max(len(c) for c in cam_lists), 8)
    Pb = _bucket(max(max(len(p) for p in pt_lists), 1), 64)
    cam_local = np.zeros((n_blocks, Cb), np.int64)
    cam_owned = np.zeros((n_blocks, Cb), bool)
    pt_local = np.zeros((n_blocks, Pb), np.int64)
    pt_valid = np.zeros((n_blocks, Pb), bool)
    pt_owned = np.zeros((n_blocks, Pb), bool)
    for b in range(n_blocks):
        cam_local[b, :len(cam_lists[b])] = cam_lists[b]
        cam_owned[b, :len(cam_lists[b])] = camown_lists[b]
        pt_local[b, :len(pt_lists[b])] = pt_lists[b]
        pt_valid[b, :len(pt_lists[b])] = True
        pt_owned[b, :len(pt_lists[b])] = own_lists[b]
    return BlockPlan(n_blocks, block_of_cam, block_of_pt, cam_local,
                     cam_owned, pt_local, pt_valid, pt_owned)


def _pack_blocks(prob: BAProblem, plan: BlockPlan, blocks=None,
                 sp_min: int = 4):
    """Build the stacked (B, ...) point-major problems (host, numpy) for
    the given block subset (default: all)."""
    if blocks is not None:
        plan = plan._replace(
            cam_local=plan.cam_local[blocks],
            cam_owned=plan.cam_owned[blocks],
            pt_local=plan.pt_local[blocks],
            pt_valid=plan.pt_valid[blocks],
            pt_owned=plan.pt_owned[blocks],
            n_blocks=len(blocks))
        block_ids = list(blocks)
    else:
        block_ids = list(range(plan.n_blocks))
    B, Cb = plan.cam_local.shape
    Pb = plan.pt_local.shape[1]
    cam_idx = np.asarray(prob.cam_idx)
    pt_idx = np.asarray(prob.pt_idx)
    uv = np.asarray(prob.uv)
    mask = np.asarray(prob.obs_mask)
    pose_fixed = np.asarray(prob.pose_fixed)
    if pose_fixed.ndim == 1:
        pose_fixed = np.broadcast_to(pose_fixed[:, None],
                                     (pose_fixed.shape[0], 6))
    point_fixed = np.asarray(prob.point_fixed)

    # Global -> local camera slot per block.
    local_of_cam = np.full((B, int(prob.poses.shape[0])), -1, np.int64)
    for b in range(B):
        local_of_cam[b, plan.cam_local[b]] = np.arange(Cb)

    # Per-block observation lists (pt-major): the block's cameras' obs
    # plus its owned points' foreign obs (see plan_blocks).
    cam_blk = plan.block_of_cam[cam_idx]
    pt_blk = plan.block_of_pt[pt_idx]
    Sp = sp_min
    counts_all = np.zeros((B, Pb), np.int64)
    per_block = []
    for b in range(B):
        bid = block_ids[b]
        sel = np.nonzero(mask & ((cam_blk == bid) | (pt_blk == bid)))[0]
        pt_g = pt_idx[sel]
        # Global point id -> local row.
        local_of_pt = np.full(int(prob.points.shape[0]), -1, np.int64)
        local_of_pt[plan.pt_local[b][plan.pt_valid[b]]] = \
            np.arange(int(plan.pt_valid[b].sum()))
        rows = local_of_pt[pt_g]
        cams_l = local_of_cam[b, cam_idx[sel]]
        keep = (rows >= 0) & (cams_l >= 0)
        per_block.append((rows[keep], cams_l[keep], uv[sel][keep]))
        cnt = np.bincount(rows[keep], minlength=Pb)
        counts_all[b] = cnt
        Sp = max(Sp, int(cnt.max()) if len(cnt) else 1)
    Sp = _bucket(Sp, sp_min)

    cam_ps = np.zeros((B, Pb, Sp), np.int32)
    uv_ps = np.zeros((B, Pb, Sp, 2), uv.dtype)
    m_ps = np.zeros((B, Pb, Sp), bool)
    for b in range(B):
        rows, cams_l, uvb = per_block[b]
        order = np.argsort(rows, kind="stable")
        rows_s = rows[order]
        starts = np.zeros(Pb, np.int64)
        starts[1:] = np.cumsum(counts_all[b])[:-1]
        slot = np.arange(len(rows_s)) - starts[rows_s]
        cam_ps[b, rows_s, slot] = cams_l[order]
        uv_ps[b, rows_s, slot] = uvb[order]
        m_ps[b, rows_s, slot] = True

    poses_b = np.asarray(prob.poses)[plan.cam_local]          # (B, Cb, 6)
    points_b = np.asarray(prob.points)[plan.pt_local]         # (B, Pb, 3)
    # Free mask: frozen if globally fixed or a padding slot; boundary
    # POINT copies (not owned) are frozen anchors.
    free_b = (~pose_fixed)[plan.cam_local].astype(poses_b.dtype)
    free_b *= plan.cam_owned[..., None]
    ptfix_b = point_fixed[plan.pt_local] | ~plan.pt_owned

    ptm = PtMajorBA(
        poses=jnp.asarray(poses_b),
        points=jnp.asarray(points_b),
        intrinsics=prob.intrinsics,
        cam_idx=jnp.asarray(cam_ps),
        uv=jnp.asarray(uv_ps),
        slot_mask=jnp.asarray(m_ps),
        pose_free=jnp.asarray(free_b),
        point_fixed=jnp.asarray(ptfix_b),
    )
    return ptm, Sp


@functools.partial(jax.jit, static_argnames=("opts", "Q"))
def _solve_blocks(ptm_b: PtMajorBA, opts: BAOptions, Q: int):
    """All blocks in ONE program: vmap of the dense-Schur LM loop over the
    leading block axis. Sharding that axis over a mesh runs blocks on
    separate devices with no cross-block communication."""

    def one(ptm):
        poses, points_t, info = _lm_loop((ptm,), opts, (Q,), lambda x: x)
        return poses, points_t[0], info

    axes = PtMajorBA(poses=0, points=0, intrinsics=None, cam_idx=0, uv=0,
                     slot_mask=0, pose_free=0, point_fixed=0)
    return jax.vmap(one, in_axes=(axes,))(ptm_b)


def partitioned_bundle_adjust(prob: BAProblem, n_blocks: int,
                              opts: BAOptions = BAOptions(),
                              sweeps: int = 2, mesh=None,
                              block_axis: str = "block"):
    """Block-Jacobi partitioned BA. Returns (problem, info).

    Each sweep solves every block's dense-Schur sub-problem from the same
    global snapshot (in parallel — optionally sharded over ``mesh``), then
    scatters the block-owned camera/point updates back into the global
    state. Boundary cameras are frozen within a block and refreshed between
    sweeps; the cross-block traffic is O(C*6) floats per sweep.
    """
    if prob.points.shape[0] == 0 or prob.uv.shape[0] == 0:
        z = jnp.zeros((), prob.poses.dtype)
        return prob, {"initial_cost": z, "final_cost": z, "sweep": 0}
    plan = plan_blocks(prob, n_blocks)
    cur = prob
    info_out = {}
    # Red-black phasing: adjacent (structure-sharing) blocks never update
    # simultaneously, so the block-Jacobi sweeps cannot oscillate.
    phases = [[b for b in range(n_blocks) if b % 2 == 0],
              [b for b in range(n_blocks) if b % 2 == 1]]
    phases = [ph for ph in phases if ph]
    for sweep in range(sweeps):
      for phase in phases:
        ptm_b, Sp = _pack_blocks(cur, plan, phase)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # Pad the block axis to a device multiple with inert blocks
            # (all slots masked, everything frozen).
            n_dev = int(mesh.devices.size)
            Bc = ptm_b.poses.shape[0]
            pad = (-Bc) % n_dev
            if pad:
                def padb(a, fill=0):
                    f = jnp.full((pad,) + a.shape[1:], fill, a.dtype)
                    return jnp.concatenate([a, f], axis=0)

                ptm_b = PtMajorBA(
                    poses=padb(ptm_b.poses), points=padb(ptm_b.points),
                    intrinsics=ptm_b.intrinsics,
                    cam_idx=padb(ptm_b.cam_idx), uv=padb(ptm_b.uv),
                    slot_mask=padb(ptm_b.slot_mask),
                    pose_free=padb(ptm_b.pose_free),
                    point_fixed=padb(ptm_b.point_fixed, True))
            blk = NamedSharding(mesh, P(block_axis))
            rep = NamedSharding(mesh, P())
            ptm_b = PtMajorBA(
                poses=jax.device_put(ptm_b.poses, blk),
                points=jax.device_put(ptm_b.points, blk),
                intrinsics=jax.device_put(ptm_b.intrinsics, rep),
                cam_idx=jax.device_put(ptm_b.cam_idx, blk),
                uv=jax.device_put(ptm_b.uv, blk),
                slot_mask=jax.device_put(ptm_b.slot_mask, blk),
                pose_free=jax.device_put(ptm_b.pose_free, blk),
                point_fixed=jax.device_put(ptm_b.point_fixed, blk),
            )
        Q = ptm_b.points.shape[1]          # one chunk per block
        poses_b, points_b, info = _solve_blocks(ptm_b, opts, Q)
        poses_b = np.asarray(poses_b)[:len(phase)]
        points_b = np.asarray(points_b)[:len(phase)]
        # Scatter owned updates back (host; the only cross-block exchange).
        poses = np.array(np.asarray(cur.poses))
        points = np.array(np.asarray(cur.points))
        own = plan.cam_owned[phase]
        poses[plan.cam_local[phase][own]] = poses_b[own]
        pv = plan.pt_owned[phase]
        points[plan.pt_local[phase][pv]] = points_b[pv]
        cur = cur._replace(poses=jnp.asarray(poses),
                           points=jnp.asarray(points))
        info_out = {"sweep": sweep,
                    "initial_cost": np.asarray(info["initial_cost"]).sum(),
                    "final_cost": np.asarray(info["final_cost"]).sum(),
                    "sp": Sp}
    return cur, info_out
