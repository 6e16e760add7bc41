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


def save_two_view_geometry_h5(path: str, group: str = "two_view", *,
                              E=None, F=None, R=None, t=None, X=None,
                              inliers=None, cheirality=None, K1=None,
                              K2=None):
    """Serialize a two-view geometry estimate.

    Mirrors the reference's HDF5 types for EssentialMatrix /
    FundamentalMatrix / PinholeCameraDecomposition (K, R, t) and the
    TwoViewGeometry record (cameras + triangulated points + cheirality)
    (reference: MultiViewGeometry/HDF5.hpp:27-60,
    Geometry/TwoViewGeometry.hpp). All fields are optional; present ones
    are written as named datasets.
    """
    import h5py

    fields = {"E": E, "F": F, "R": R, "t": t, "X": X, "inliers": inliers,
              "cheirality": cheirality, "K1": K1, "K2": K2}
    with h5py.File(path, "a") as f:
        if group in f:
            del f[group]
        g = f.create_group(group)
        for name, val in fields.items():
            if val is not None:
                g.create_dataset(name, data=np.asarray(val))


def load_two_view_geometry_h5(path: str, group: str = "two_view") -> dict:
    """Load a two-view geometry group as a dict of numpy arrays."""
    import h5py

    with h5py.File(path, "r") as f:
        g = f[group]
        return {name: np.asarray(g[name]) for name in g}
