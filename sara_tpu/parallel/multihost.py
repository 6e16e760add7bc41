"""Multi-host distributed runtime setup.

The multi-host layer for BASELINE config 5 (N >= 2 hosts): initializes
``jax.distributed``, builds a (hosts, chips) mesh, and provides helpers to
shard the BA problem so collectives ride ICI within a slice and DCN across
hosts. Single-host environments (this dev box) exercise the same code path
with num_processes=1; the 8-device CPU mesh tests validate the shardings.
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None):
    """Initialize the multi-host runtime (idempotent, env-var driven).

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    arguments are omitted; no-ops for single-process runs.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 or coordinator_address is None:
        return False
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def make_host_chip_mesh(host_axis: str = "host", chip_axis: str = "chip",
                        hosts: int | None = None,
                        n_devices: int | None = None) -> Mesh:
    """2-D (hosts, chips-per-host) mesh over all global devices.

    BA shards points/observations over the chip axis (ICI collectives) and
    map blocks over the host axis (DCN) — SURVEY.md §5 design.

    ``hosts`` overrides the host-row count (default: the process count) so
    a single-process run over N virtual devices can exercise the same 2-D
    shardings the real multi-host deployment uses.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n_host = hosts if hosts is not None else max(jax.process_count(), 1)
    if len(devs) % n_host:
        raise ValueError(f"{len(devs)} devices not divisible by "
                         f"{n_host} host rows")
    grid = np.asarray(devs).reshape(n_host, len(devs) // n_host)
    return Mesh(grid, (host_axis, chip_axis))


def shard_ba_problem_2d(prob, mesh: Mesh, host_axis: str = "host",
                        chip_axis: str = "chip"):
    """Place a BAProblem on a (host, chip) mesh: map blocks (points) are
    partitioned over the HOST axis, observations over the CHIP axis,
    cameras/intrinsics replicated. GSPMD inserts the point all-gathers
    (DCN) and the per-chip segment-sum reductions (ICI)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sara_tpu.parallel.dist_ba import _pad_axis

    n_host, n_chip = mesh.devices.shape
    p_orig = prob.points.shape[0]
    o_orig = prob.obs_mask.shape[0]
    obs_mask = _pad_axis(prob.obs_mask, n_chip)
    obs_mask = obs_mask & (jnp.arange(obs_mask.shape[0]) < o_orig)
    prob = prob._replace(
        cam_idx=_pad_axis(prob.cam_idx, n_chip),
        pt_idx=_pad_axis(prob.pt_idx, n_chip),
        uv=_pad_axis(prob.uv, n_chip),
        obs_mask=obs_mask,
        points=_pad_axis(prob.points, n_host),
        point_fixed=_pad_axis(prob.point_fixed, n_host),
    )
    p_new = prob.points.shape[0]
    prob = prob._replace(
        point_fixed=prob.point_fixed | (jnp.arange(p_new) >= p_orig))

    put = jax.device_put
    repl = NamedSharding(mesh, P())
    by_host = NamedSharding(mesh, P(host_axis))
    by_chip = NamedSharding(mesh, P(chip_axis))
    return prob._replace(
        poses=put(prob.poses, repl),
        points=put(prob.points, by_host),
        intrinsics=put(prob.intrinsics, repl),
        cam_idx=put(prob.cam_idx, by_chip),
        pt_idx=put(prob.pt_idx, by_chip),
        uv=put(prob.uv, by_chip),
        obs_mask=put(prob.obs_mask, by_chip),
        pose_fixed=put(prob.pose_fixed, repl),
        point_fixed=put(prob.point_fixed, by_host),
        intr_free=(None if prob.intr_free is None
                   else put(prob.intr_free, repl)),
    )


def multihost_bundle_adjust(prob, mesh: Mesh, opts=None,
                            host_axis: str = "host",
                            chip_axis: str = "chip"):
    """Bundle adjustment over a (host, chip) mesh — the BASELINE config 5
    entry point. Same numeric program as ``sara_tpu.ba.bundle_adjust``;
    only the shardings differ."""
    from sara_tpu.ba.core import BAOptions
    from sara_tpu.parallel.dist_ba import _ba_jit

    opts = opts or BAOptions()
    sp = shard_ba_problem_2d(prob, mesh, host_axis, chip_axis)
    with mesh:
        out, info = _ba_jit(sp, opts)
    return out, info


def process_local_slice(n: int) -> slice:
    """Row range [start, stop) of a length-n global array owned by this
    process (contiguous block partitioning for per-host input pipelines)."""
    p = jax.process_index()
    np_ = jax.process_count()
    per = -(-n // np_)
    return slice(p * per, min((p + 1) * per, n))
