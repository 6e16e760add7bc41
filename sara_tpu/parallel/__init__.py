"""Device meshes and distributed execution.

First-class new subsystem with no reference counterpart (the reference is
single-process; SURVEY.md §2.5, §5): device meshes via ``jax.sharding``,
sharded bundle adjustment (observations/points partitioned, camera system
reduced with XLA collectives), and data-parallel frontend batching.
"""

from sara_tpu.parallel.mesh import make_mesh, local_device_count
from sara_tpu.parallel.comm_model import BACommModel
from sara_tpu.parallel.dist_ba import (
    shard_ba_problem, distributed_bundle_adjust)
from sara_tpu.parallel.dist_frontend import batched_match_pairs
from sara_tpu.parallel.multihost import (
    initialize_distributed, make_host_chip_mesh, multihost_bundle_adjust,
    process_local_slice, shard_ba_problem_2d)

__all__ = [
    "make_mesh", "local_device_count", "BACommModel",
    "shard_ba_problem", "distributed_bundle_adjust",
    "batched_match_pairs",
    "initialize_distributed", "make_host_chip_mesh",
    "multihost_bundle_adjust", "process_local_slice", "shard_ba_problem_2d",
]
