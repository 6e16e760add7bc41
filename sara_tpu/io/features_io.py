"""HDF5 serialization of keypoints and matches.

Rebuild of the reference's HDF5 persistence
(reference: cpp/src/DO/Sara/Core/HDF5.hpp, Features/IO.hpp, Match/HDF5.hpp,
MultiViewGeometry/HDF5.hpp:27+).
"""

from __future__ import annotations

import numpy as np

from sara_tpu.core.types import Keypoints, Matches


def save_keypoints_h5(path: str, kp: Keypoints, group: str = "keypoints"):
    import h5py
    import jax.numpy as jnp

    with h5py.File(path, "a") as f:
        if group in f:
            del f[group]
        g = f.create_group(group)
        for name in kp._fields:
            g.create_dataset(name, data=np.asarray(getattr(kp, name)))


def load_keypoints_h5(path: str, group: str = "keypoints") -> Keypoints:
    import h5py
    import jax.numpy as jnp

    with h5py.File(path, "r") as f:
        g = f[group]
        return Keypoints(**{name: jnp.asarray(np.asarray(g[name]))
                            for name in Keypoints._fields})


def save_matches_h5(path: str, m: Matches, group: str = "matches"):
    import h5py

    with h5py.File(path, "a") as f:
        if group in f:
            del f[group]
        g = f.create_group(group)
        for name in m._fields:
            g.create_dataset(name, data=np.asarray(getattr(m, name)))


def load_matches_h5(path: str, group: str = "matches") -> Matches:
    import h5py
    import jax.numpy as jnp

    with h5py.File(path, "r") as f:
        g = f[group]
        return Matches(**{name: jnp.asarray(np.asarray(g[name]))
                          for name in Matches._fields})
