"""Linear-Gaussian Kalman filtering, batched.

Rebuild of the reference's concept-based Kalman filter
(reference: cpp/src/DO/Sara/KalmanFilter/ObservationEquation.hpp,
StateTransitionModel.hpp, DistributionConcepts.hpp). C++20 concepts become
plain pytrees + pure functions; everything broadcasts over leading batch
dims so a fleet of trackers predicts/updates as one vmapped program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class GaussianState(NamedTuple):
    x: jnp.ndarray   # (..., n) mean
    P: jnp.ndarray   # (..., n, n) covariance


class KalmanModel(NamedTuple):
    F: jnp.ndarray   # (n, n) state transition
    Q: jnp.ndarray   # (n, n) process noise
    H: jnp.ndarray   # (m, n) observation
    R: jnp.ndarray   # (m, m) observation noise


def kf_predict(state: GaussianState, model: KalmanModel) -> GaussianState:
    x = jnp.einsum("ij,...j->...i", model.F, state.x)
    P = model.F @ state.P @ model.F.T + model.Q
    return GaussianState(x, P)


def kf_update(state: GaussianState, model: KalmanModel, z: jnp.ndarray):
    """Returns (posterior state, innovation, innovation covariance)."""
    Hx = jnp.einsum("ij,...j->...i", model.H, state.x)
    y = z - Hx
    S = model.H @ state.P @ model.H.T + model.R
    K = state.P @ model.H.T @ jnp.linalg.inv(S)
    x = state.x + jnp.einsum("...ij,...j->...i", K, y)
    n = state.x.shape[-1]
    P = (jnp.eye(n, dtype=state.P.dtype) - K @ model.H) @ state.P
    return GaussianState(x, P), y, S


def mahalanobis2(y: jnp.ndarray, S: jnp.ndarray) -> jnp.ndarray:
    """Squared Mahalanobis distance of innovation(s)."""
    sol = jnp.linalg.solve(S, y[..., None])[..., 0]
    return jnp.sum(y * sol, axis=-1)


def constant_velocity_box_model(dt: float = 1.0, q: float = 1.0,
                                r: float = 1.0) -> KalmanModel:
    """8-state constant-velocity box model (cx, cy, w, h, vx, vy, vw, vh) —
    the standard MOT state (reference: MultipleObjectTracking observation /
    process noise models)."""
    n = 8
    F = jnp.eye(n)
    F = F.at[0, 4].set(dt).at[1, 5].set(dt).at[2, 6].set(dt).at[3, 7].set(dt)
    Q = jnp.diag(jnp.asarray([q, q, q, q, 4 * q, 4 * q, 4 * q, 4 * q],
                             jnp.float32)) * dt
    H = jnp.zeros((4, n)).at[0, 0].set(1).at[1, 1].set(1) \
        .at[2, 2].set(1).at[3, 3].set(1)
    R = jnp.eye(4) * r
    return KalmanModel(F, Q, H, R)
