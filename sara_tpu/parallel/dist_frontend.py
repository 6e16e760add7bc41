"""Data-parallel frontend: batched matching over image pairs on a mesh.

The TPU-native analog of the reference's thread-level data parallelism
(reference: OpenMP over keypoints, FeatureDetectors/SIFT.cpp:74-86): batches
of descriptor sets are matched as one vmapped GEMM program with the batch
axis sharded over the mesh (pure DP — XLA keeps each pair's GEMM local to
its device).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@functools.partial(jax.jit, static_argnames=("ratio",))
def _match_batch(da, ma, db, mb, ratio: float):
    """Batched mutual ratio-test matching.

    da: (B, N, D), ma: (B, N) masks; returns (j (B, N), ok (B, N), d1)."""

    def one(dA, mA, dB, mB):
        from sara_tpu.matching.brute_force import _pairwise_sqdist, _top2_min

        d2 = _pairwise_sqdist(dA, dB)
        d2 = jnp.where(mA[:, None] & mB[None, :], d2, jnp.inf)
        d1, d2nd, j = _top2_min(d2)
        ok = (d1 < ratio * ratio * d2nd) & mA & jnp.isfinite(d1)
        jT = jnp.argmin(d2, axis=0)
        ok = ok & (jT[j] == jnp.arange(dA.shape[0]))
        return j.astype(jnp.int32), ok, d1

    return jax.vmap(one)(da, ma, db, mb)


def batched_match_pairs(desc_a, mask_a, desc_b, mask_b, mesh: Mesh | None = None,
                        ratio: float = 0.8, axis: str = "shard"):
    """Match B descriptor-set pairs, batch axis sharded over the mesh."""
    if mesh is not None:
        n = mesh.devices.size
        assert desc_a.shape[0] % n == 0, "batch must divide mesh size"
        sh = NamedSharding(mesh, P(axis))
        desc_a, mask_a, desc_b, mask_b = (
            jax.device_put(x, sh) for x in (desc_a, mask_a, desc_b, mask_b))
        with mesh:
            return _match_batch(desc_a, mask_a, desc_b, mask_b, ratio)
    return _match_batch(desc_a, mask_a, desc_b, mask_b, ratio)
