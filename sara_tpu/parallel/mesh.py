"""Mesh construction helpers.

Builds ``jax.sharding.Mesh`` objects over the local (or distributed) device
set. Axis conventions used across the framework:

- ``"shard"``: the main data-parallel axis — observations/points in BA,
  image pairs in the matching frontend.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def local_device_count() -> int:
    return jax.local_device_count()


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))
