"""Level sets: signed distance by fast sweeping (eikonal solver).

TPU-native replacement for the reference's fast-marching level-set tools
(reference: cpp/src/DO/Sara/ImageProcessing/LevelSets/FastMarching.hpp).
Fast *marching* is a priority-queue algorithm (hostile to SIMD); fast
*sweeping* solves the same eikonal equation |grad u| = f with a fixed number
of directional Gauss-Seidel sweeps — each sweep is a ``lax.scan`` over rows,
vectorized across columns, which XLA pipelines well on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e10


def _eikonal_update(u_x, u_y, f):
    """Godunov eikonal update from axis-neighbor minima (unit grid)."""
    a = jnp.minimum(u_x, u_y)
    b = jnp.maximum(u_x, u_y)
    # 1-D update if the difference is large, else 2-D quadratic solution.
    one_d = a + f
    disc = 2.0 * f * f - (u_x - u_y) ** 2
    two_d = 0.5 * (u_x + u_y + jnp.sqrt(jnp.maximum(disc, 0.0)))
    return jnp.where(one_d <= b, one_d, two_d)


def _sweep_rows(u, f, reverse_rows: bool, reverse_cols: bool):
    """One directional sweep: scan rows top->bottom (or reversed), each row
    updated from the previously-swept row and the column-neighbor minima."""
    if reverse_cols:
        u = u[:, ::-1]
        f = f[:, ::-1]
    if reverse_rows:
        u = u[::-1]
        f = f[::-1]

    H, W = u.shape

    def row_step(prev_row, inputs):
        u_row, f_row = inputs
        # Column-direction neighbor minima within the row: prefix min via
        # associative scan on (value + distance) is approximated by a few
        # shifted-min iterations (exact for smooth fronts).
        left = jnp.concatenate([jnp.array([_BIG], u.dtype), u_row[:-1]])
        right = jnp.concatenate([u_row[1:], jnp.array([_BIG], u.dtype)])
        ux = jnp.minimum(left, right)
        new = jnp.minimum(u_row, _eikonal_update(ux, prev_row, f_row))
        # One Gauss-Seidel refinement inside the row.
        left = jnp.concatenate([jnp.array([_BIG], u.dtype), new[:-1]])
        right = jnp.concatenate([new[1:], jnp.array([_BIG], u.dtype)])
        ux = jnp.minimum(left, right)
        new = jnp.minimum(new, _eikonal_update(ux, prev_row, f_row))
        return new, new

    init = jnp.full((W,), _BIG, u.dtype)
    _, rows = jax.lax.scan(row_step, init, (u, f))
    out = rows
    if reverse_rows:
        out = out[::-1]
    if reverse_cols:
        out = out[:, ::-1]
    return out


@functools.partial(jax.jit, static_argnames=("num_sweeps",))
def fast_sweeping_distance(seed_mask: jnp.ndarray, speed=None,
                           num_sweeps: int = 4, seed_values=None):
    """Distance transform from seed pixels by fast sweeping.

    seed_mask: (H, W) bool — the zero level set. speed: optional (H, W)
    slowness f (default 1 -> euclidean-like distance). seed_values:
    optional (H, W) initial distances at seed pixels (default 0 — pass the
    sub-cell distance |phi|/|grad phi| for a first-order-accurate
    interface). Returns (H, W) u.
    """
    H, W = seed_mask.shape
    f = jnp.ones((H, W), jnp.float32) if speed is None else speed
    sv = jnp.zeros((H, W), jnp.float32) if seed_values is None else seed_values
    u = jnp.where(seed_mask, sv, _BIG)

    def one_round(_, u):
        for rr in (False, True):
            for rc in (False, True):
                u = _sweep_rows(u, f, rr, rc)
        return u

    return jax.lax.fori_loop(0, num_sweeps, one_round, u)


def signed_distance(mask: jnp.ndarray, num_sweeps: int = 4):
    """Signed distance to the boundary of a binary region (positive outside)."""
    m = mask
    boundary = m & ~(
        jnp.roll(m, 1, 0) & jnp.roll(m, -1, 0)
        & jnp.roll(m, 1, 1) & jnp.roll(m, -1, 1))
    d = fast_sweeping_distance(boundary, num_sweeps=num_sweeps)
    return jnp.where(mask, -d, d)


# --------------------------------------------------------------------------
# Level-set evolution machinery: upwind finite differences, flux operators,
# TVD time integrators, narrow-band driver.
#
# TPU-native rebuild of the reference's per-point level-set toolkit
# (reference: cpp/src/DO/Sara/ImageProcessing/LevelSets/FiniteDifferences.hpp,
# Flux.hpp:20-127, TimeIntegrators.hpp:21-93, NarrowBand.hpp:20-270,
# FastMarching.hpp). The reference iterates point-by-point over a sparse
# narrow band with a priority-queue fast-marching reinitializer; on TPU the
# whole grid is one vectorized program — the "narrow band" becomes a mask
# that gates updates (same asymptotic accuracy, SIMD-friendly), and
# reinitialization is the proven-equivalent fast-sweeping eikonal solver
# above (same Godunov upwind discretization as fast marching, Zhao 2004).
# --------------------------------------------------------------------------


def _fwd(u, axis):
    """Forward difference u[i+1]-u[i]; zero at the high border (the
    reference clamps out-of-range coordinates, FiniteDifferences.hpp)."""
    d = jnp.diff(u, axis=axis)
    pad = [(0, 0)] * u.ndim
    pad[axis] = (0, 1)
    return jnp.pad(d, pad)


def _bwd(u, axis):
    """Backward difference u[i]-u[i-1]; zero at the low border."""
    d = jnp.diff(u, axis=axis)
    pad = [(0, 0)] * u.ndim
    pad[axis] = (1, 0)
    return jnp.pad(d, pad)


def _central(u, axis):
    lo = jnp.take(u, jnp.clip(jnp.arange(u.shape[axis]) - 1, 0, None), axis)
    hi = jnp.take(u, jnp.clip(jnp.arange(u.shape[axis]) + 1, None,
                              u.shape[axis] - 1), axis)
    return 0.5 * (hi - lo)


def _weno3(dm2, dm1, d0):
    """WENO3 reconstruction of a one-sided derivative from three
    consecutive first differences (reference: FiniteDifferences.hpp WENO3)."""
    eps = 1e-6
    b0 = (d0 - dm1) ** 2
    b1 = (dm1 - dm2) ** 2
    a0 = (2.0 / 3.0) / (b0 + eps) ** 2
    a1 = (1.0 / 3.0) / (b1 + eps) ** 2
    w = a0 / (a0 + a1)
    return w * 0.5 * (dm1 + d0) + (1.0 - w) * (1.5 * dm1 - 0.5 * dm2)


def weno3_derivatives(u, axis):
    """(backward, forward) WENO3 one-sided derivatives along ``axis``."""
    d = _bwd(u, axis)  # d[i] = u[i]-u[i-1]

    def shift(k):  # output[i] = d[i+k], border-clamped like the reference
        idx = jnp.clip(jnp.arange(d.shape[axis]) + k, 0, d.shape[axis] - 1)
        return jnp.take(d, idx, axis)

    dm = _weno3(shift(-1), d, shift(1))
    dp = _weno3(shift(2), shift(1), d)
    return dm, dp


def normal_field(u, eps: float = 1e-6):
    """Unit normal grad(u)/|grad(u)| via central differences
    (reference: Flux.hpp::normal)."""
    g = jnp.stack([_central(u, a) for a in range(u.ndim)])
    n = jnp.sqrt(jnp.sum(g * g, axis=0))
    return g / jnp.maximum(n, eps)


def advection(u, velocity):
    """Upwind advection term -<v, grad u> (reference: Flux.hpp::advection).

    velocity: (ndim, H, W) field. Returns du/dt contribution."""
    delta = jnp.zeros_like(u)
    for a in range(u.ndim):
        v = velocity[a]
        du = jnp.where(v > 0, _bwd(u, a), _fwd(u, a))
        delta = delta - v * du
    return delta


def normal_motion(u, beta):
    """Godunov upwind normal motion -beta * |grad u|
    (reference: Flux.hpp::normal_motion). beta: scalar or (H, W) field."""
    beta = jnp.asarray(beta, u.dtype)
    sq_pos = jnp.zeros_like(u)
    sq_neg = jnp.zeros_like(u)
    for a in range(u.ndim):
        up = _fwd(u, a)
        um = _bwd(u, a)
        sq_pos += jnp.minimum(up, 0.0) ** 2 + jnp.maximum(um, 0.0) ** 2
        sq_neg += jnp.maximum(up, 0.0) ** 2 + jnp.minimum(um, 0.0) ** 2
    grad = jnp.where(beta > 0, jnp.sqrt(sq_pos), jnp.sqrt(sq_neg))
    return -beta * grad


def curvature_motion(u, eps: float = 1e-6):
    """Mean-curvature motion kappa * |grad u| with
    kappa = div(grad u / |grad u|): a circle of radius R shrinks at
    dR/dt = -1/R (the analytic gate in tests/test_levelsets.py)."""
    g = jnp.stack([_central(u, a) for a in range(u.ndim)])
    norm = jnp.sqrt(jnp.sum(g * g, axis=0))
    n = g / jnp.maximum(norm, eps)
    kappa = jnp.zeros_like(u)
    for a in range(u.ndim):
        kappa += _central(n[a], a)
    return kappa * norm


def reinitialization_flux(u, u0, delta: float = 1.0):
    """PDE reinitialization flux S(u0) (1 - |grad u|) with Godunov
    upwinding by the smoothed sign of u0
    (reference: Flux.hpp::reinitialization)."""
    s = u0 / jnp.sqrt(u0 * u0 + delta * delta)
    sq_pos = jnp.zeros_like(u)
    sq_neg = jnp.zeros_like(u)
    for a in range(u.ndim):
        up = _fwd(u, a)
        um = _bwd(u, a)
        sq_pos += jnp.minimum(up, 0.0) ** 2 + jnp.maximum(um, 0.0) ** 2
        sq_neg += jnp.maximum(up, 0.0) ** 2 + jnp.minimum(um, 0.0) ** 2
    grad = jnp.where(s > 0, jnp.sqrt(sq_neg), jnp.sqrt(sq_pos))
    return s * (1.0 - grad)


def extension_flux(u, d, delta: float = 1.0):
    """Velocity-extension flux: advect quantity ``d`` along the outward
    normal of ``u`` scaled by the smoothed sign of u
    (reference: Flux.hpp::extension)."""
    v = normal_field(u)
    s = u / jnp.sqrt(u * u + delta * delta)
    return advection(d, v * s)


def euler_step(u, du, dt, domain=None):
    """Forward-Euler update, optionally gated to a domain mask
    (reference: TimeIntegrators.hpp::EulerIntegrator)."""
    new = u + dt * du
    return jnp.where(domain, new, u) if domain is not None else new


def midpoint_step(u, flux_fn, dt, domain=None):
    """Midpoint (RK2) update: full step evaluated at the half-step state
    (reference: TimeIntegrators.hpp::MidpointIntegrator)."""
    half = euler_step(u, flux_fn(u), 0.5 * dt, domain)
    return euler_step(u, flux_fn(half), dt, domain)


def tvd_rk2_step(u, flux_fn, dt, domain=None):
    """TVD (SSP) RK2: average of two Euler stages — total-variation
    stability for the upwind fluxes above."""
    u1 = euler_step(u, flux_fn(u), dt, domain)
    u2 = euler_step(u1, flux_fn(u1), dt, domain)
    out = 0.5 * (u + u2)
    return jnp.where(domain, out, u) if domain is not None else out


def _zero_crossing_mask(phi):
    """Cells adjacent to a sign change along any axis
    (reference: NarrowBand.hpp::populate_zero_crossings)."""
    m = jnp.zeros(phi.shape, bool)
    for a in range(phi.ndim):
        nxt = jnp.take(phi, jnp.clip(jnp.arange(phi.shape[a]) + 1, None,
                                     phi.shape[a] - 1), a)
        prv = jnp.take(phi, jnp.clip(jnp.arange(phi.shape[a]) - 1, 0, None), a)
        m = m | (phi * nxt <= 0) | (phi * prv <= 0)
    return m


@functools.partial(jax.jit, static_argnames=("num_sweeps",))
def reinitialize_signed_distance(phi, num_sweeps: int = 4):
    """Rebuild phi as a signed distance to its own zero level set, seeding
    interface cells with the first-order sub-cell distance
    |phi| / |grad phi| (the TPU-native analog of the reference's two
    FastMarching reinitializers, NarrowBand.hpp:33-35)."""
    seeds = _zero_crossing_mask(phi)
    g = jnp.stack([_central(phi, a) for a in range(phi.ndim)])
    gn = jnp.maximum(jnp.sqrt(jnp.sum(g * g, axis=0)), 1e-6)
    sub = jnp.abs(phi) / gn
    d = fast_sweeping_distance(seeds, num_sweeps=num_sweeps,
                               seed_values=sub)
    return jnp.where(phi < 0, -d, d)


class NarrowBand:
    """Narrow-band level-set evolution driver
    (reference: NarrowBand.hpp:20-270, LevelSets/FastMarching.hpp).

    Maintains phi as an approximate signed distance, evolves it only inside
    the band |phi| <= band_radius, and reinitializes (fast sweeping) when
    the front approaches the band edge — detected exactly like the
    reference's ``reinit_needed``: a cell whose |phi| exceeded ``thres`` at
    the last reinit has flipped sign.
    """

    def __init__(self, phi, band_radius: float = 6.0):
        self.band_radius = float(band_radius)
        self.phi = reinitialize_signed_distance(jnp.asarray(phi))
        self._snapshot()

    def _snapshot(self):
        self.phi_prev = self.phi
        self.band = jnp.abs(self.phi) <= self.band_radius

    def reinit_needed(self, thres: float | None = None) -> bool:
        thres = self.band_radius / 2.0 if thres is None else thres
        prev, curr = self.phi_prev, self.phi
        flip = ((prev > thres) & (curr <= 0)) | ((prev < -thres) & (curr >= 0))
        return bool(jnp.any(flip & self.band))

    def step(self, flux_fn, dt: float, integrator=tvd_rk2_step):
        """One band-gated time step; reinitializes when needed."""
        self.phi = integrator(self.phi, flux_fn, dt, domain=self.band)
        if self.reinit_needed():
            self.phi = reinitialize_signed_distance(self.phi)
            self._snapshot()

    def run(self, flux_fn, dt: float, steps: int,
            integrator=tvd_rk2_step, reinit_every: int = 0):
        """Evolve ``steps`` iterations; optional forced reinit cadence."""
        for i in range(steps):
            self.step(flux_fn, dt, integrator)
            if reinit_every and (i + 1) % reinit_every == 0:
                self.phi = reinitialize_signed_distance(self.phi)
                self._snapshot()
        return self.phi
