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


def make_host_chip_mesh(host_axis: str = "host", chip_axis: str = "chip") -> Mesh:
    """2-D (hosts, chips-per-host) mesh over all global devices.

    BA shards points/observations over the chip axis (ICI collectives) and
    map blocks over the host axis (DCN) — SURVEY.md §5 design.
    """
    devs = jax.devices()
    n_proc = jax.process_count()
    per_host = len(devs) // max(n_proc, 1)
    grid = np.asarray(devs).reshape(n_proc, per_host)
    return Mesh(grid, (host_axis, chip_axis))


def process_local_slice(n: int) -> slice:
    """Row range [start, stop) of a length-n global array owned by this
    process (contiguous block partitioning for per-host input pipelines)."""
    p = jax.process_index()
    np_ = jax.process_count()
    per = -(-n // np_)
    return slice(p * per, min((p + 1) * per, n))
