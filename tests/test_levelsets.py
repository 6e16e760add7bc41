"""Level-set machinery gates.

Reference capabilities covered (cpp/src/DO/Sara/ImageProcessing/LevelSets/):
- Flux.hpp upwind operators (advection, normal motion, curvature motion,
  reinitialization) — exercised through evolution tests with analytic
  answers;
- TimeIntegrators.hpp Euler/midpoint — step equivalence checks;
- NarrowBand.hpp + FastMarching.hpp — band-gated evolution must match the
  full-grid evolution near the front, with fast-sweeping reinitialization.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sara_tpu.image.levelsets import (NarrowBand, advection, curvature_motion,
                                      euler_step, fast_sweeping_distance,
                                      midpoint_step, normal_motion,
                                      reinitialization_flux,
                                      reinitialize_signed_distance,
                                      signed_distance, tvd_rk2_step,
                                      weno3_derivatives, _zero_crossing_mask)


def circle_phi(n, cx, cy, r):
    y, x = np.mgrid[0:n, 0:n]
    return jnp.asarray(np.hypot(x - cx, y - cy) - r, jnp.float32)


def front_radius(phi, cx, cy):
    """Mean distance of zero-crossing cells from the center, sub-cell
    corrected by phi (phi is ~signed distance)."""
    m = np.asarray(_zero_crossing_mask(phi))
    y, x = np.nonzero(m)
    r = np.hypot(x - cx, y - cy) - np.asarray(phi)[y, x]
    return float(r.mean())


def test_fast_sweeping_matches_euclidean_distance():
    n = 64
    seed = np.zeros((n, n), bool)
    seed[32, 32] = True
    d = np.asarray(fast_sweeping_distance(jnp.asarray(seed), num_sweeps=4))
    y, x = np.mgrid[0:n, 0:n]
    true = np.hypot(x - 32, y - 32)
    sel = true < 20
    # Godunov 4-sweep solution is within a few percent of euclidean.
    assert np.max(np.abs(d[sel] - true[sel])) < 1.2


def test_reinitialize_recovers_signed_distance():
    phi0 = circle_phi(96, 48, 48, 20)
    # Distort far from the front but keep the zero set.
    distorted = jnp.sign(phi0) * (jnp.abs(phi0) ** 1.5 + 0.2 * jnp.abs(phi0))
    phi = reinitialize_signed_distance(distorted)
    band = np.abs(np.asarray(phi0)) < 10
    err = np.abs(np.asarray(phi) - np.asarray(phi0))[band]
    assert np.median(err) < 0.3
    assert np.max(err) < 1.0


def test_normal_motion_expands_circle_at_unit_speed():
    n, r0 = 96, 15.0
    phi = circle_phi(n, 48, 48, r0)
    dt, steps = 0.4, 25  # front moves outward 10 px (beta > 0 = expansion)
    flux = lambda u: normal_motion(u, 1.0)
    for _ in range(steps):
        phi = tvd_rk2_step(phi, flux, dt)
    r = front_radius(phi, 48, 48)
    assert abs(r - (r0 + dt * steps)) < 0.35


def test_curvature_flow_shrinking_circle_radius_law():
    """dR/dt = -1/R  =>  R(t) = sqrt(R0^2 - 2 t)."""
    n, r0 = 128, 22.0
    phi = circle_phi(n, 64, 64, r0)
    dt, steps = 0.1, 1000  # t = 100 -> R = sqrt(484 - 200) = 16.85
    import jax

    def body(phi, _):
        return tvd_rk2_step(phi, curvature_motion, dt), None

    body = jax.jit(body)
    # Periodic reinitialization keeps |grad phi| ~ 1 (curvature flow does
    # not preserve the distance property; without it the zero set is right
    # but the measured sub-cell radius is biased).
    for _ in range(steps // 50):
        phi, _ = jax.lax.scan(body, phi, None, length=50)
        phi = reinitialize_signed_distance(phi)
    r_true = float(np.sqrt(r0 ** 2 - 2 * dt * steps))
    r = front_radius(phi, 64, 64)
    assert abs(r - r_true) < 0.3, (r, r_true)


def test_advection_translates_front():
    n = 96
    phi = circle_phi(n, 40, 48, 12)
    v = jnp.stack([jnp.zeros((n, n)), jnp.ones((n, n))])  # +x velocity
    dt, steps = 0.5, 20  # move 10 px in x
    flux = lambda u: advection(u, v)
    for _ in range(steps):
        phi = tvd_rk2_step(phi, flux, dt)
    r = front_radius(phi, 50, 48)
    assert abs(r - 12.0) < 0.5


def test_reinitialization_flux_fixed_point_is_distance():
    """A true signed distance is (near) a fixed point of the reinit PDE."""
    phi = circle_phi(96, 48, 48, 18)
    flux = np.asarray(reinitialization_flux(phi, phi))
    band = np.abs(np.asarray(phi)) < 12
    inner = band & (np.abs(np.asarray(phi)) > 2)
    assert np.max(np.abs(flux[inner])) < 0.15


def test_time_integrators_agree_on_linear_flux():
    phi = circle_phi(64, 32, 32, 10)
    const = jnp.ones_like(phi) * 0.7
    flux = lambda u: const  # du/dt independent of u
    e = euler_step(phi, flux(phi), 0.2)
    m = midpoint_step(phi, flux, 0.2)
    t = tvd_rk2_step(phi, flux, 0.2)
    np.testing.assert_allclose(np.asarray(e), np.asarray(m), atol=1e-6)
    np.testing.assert_allclose(np.asarray(e), np.asarray(t), atol=1e-6)


def test_domain_mask_gates_updates():
    phi = circle_phi(64, 32, 32, 10)
    dom = jnp.abs(phi) <= 5.0
    out = euler_step(phi, jnp.ones_like(phi), 1.0, domain=dom)
    delta = np.asarray(out - phi)
    assert np.allclose(delta[np.asarray(dom)], 1.0, atol=1e-5)
    assert np.all(delta[~np.asarray(dom)] == 0.0)


def test_narrow_band_matches_full_grid_near_front():
    """Band-gated expansion == full-grid expansion at the front (the
    reference's correctness contract for NarrowBand.hpp)."""
    n, r0 = 96, 14.0
    phi0 = circle_phi(n, 48, 48, r0)
    dt, steps = 0.4, 20
    flux = lambda u: normal_motion(u, 1.0)

    full = phi0
    for _ in range(steps):
        full = tvd_rk2_step(full, flux, dt)

    nb = NarrowBand(phi0, band_radius=6.0)
    nb.run(flux, dt, steps)

    r_full = front_radius(full, 48, 48)
    r_band = front_radius(nb.phi, 48, 48)
    assert abs(r_full - r_band) < 0.3
    assert abs(r_band - (r0 + dt * steps)) < 0.6


def test_narrow_band_reinit_triggers():
    """A front crossing half the band radius must trigger reinit (and the
    evolution must stay accurate long after several reinits)."""
    n, r0 = 128, 10.0
    phi0 = circle_phi(n, 64, 64, r0)
    dt, steps = 0.4, 75  # expand by 30 px >> band radius 5
    nb = NarrowBand(phi0, band_radius=5.0)
    nb.run(lambda u: normal_motion(u, 1.0), dt, steps)
    r = front_radius(nb.phi, 64, 64)
    assert abs(r - (r0 + dt * steps)) < 1.0


def test_weno3_exact_on_smooth_quadratic():
    x = jnp.arange(32, dtype=jnp.float32)
    u = jnp.tile((0.5 * x ** 2)[None, :], (4, 1))
    dm, dp = weno3_derivatives(u, axis=1)
    interior = np.s_[:, 3:-3]
    # d/dx (x^2/2) = x; one-sided 2nd-order reconstructions hit it exactly
    # off the borders.
    np.testing.assert_allclose(np.asarray(dm)[interior],
                               np.asarray(x)[3:-3][None, :].repeat(4, 0),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(dp)[interior],
                               np.asarray(x)[3:-3][None, :].repeat(4, 0),
                               atol=1e-3)


def test_signed_distance_circle():
    n = 64
    y, x = np.mgrid[0:n, 0:n]
    mask = jnp.asarray(np.hypot(x - 32, y - 32) < 15)
    sd = np.asarray(signed_distance(mask))
    assert sd[32, 32] < -10
    assert sd[0, 0] > 20


def test_fluxes_work_in_3d():
    """The flux operators are dimension-generic (the reference templates
    are ImageView<T, N>); evolve a 3-D sphere under unit normal motion
    and check the radius law."""
    n, r0 = 48, 10.0
    z, y, x = np.mgrid[0:n, 0:n, 0:n]
    phi = jnp.asarray(np.sqrt((x - 24) ** 2 + (y - 24) ** 2
                              + (z - 24) ** 2) - r0, jnp.float32)
    dt, steps = 0.4, 12  # expand by 4.8
    flux = lambda u: normal_motion(u, 1.0)
    for _ in range(steps):
        phi = tvd_rk2_step(phi, flux, dt)
    m = np.asarray(_zero_crossing_mask(phi))
    zz, yy, xx = np.nonzero(m)
    r = (np.sqrt((xx - 24.0) ** 2 + (yy - 24.0) ** 2 + (zz - 24.0) ** 2)
         - np.asarray(phi)[zz, yy, xx]).mean()
    assert abs(r - (r0 + dt * steps)) < 0.5


def test_advection_3d_translates():
    n = 40
    z, y, x = np.mgrid[0:n, 0:n, 0:n]
    phi = jnp.asarray(np.sqrt((x - 14) ** 2 + (y - 20) ** 2
                              + (z - 20) ** 2) - 8.0, jnp.float32)
    v = jnp.stack([jnp.zeros((n, n, n)), jnp.zeros((n, n, n)),
                   jnp.ones((n, n, n))])  # +x
    dt, steps = 0.5, 12
    flux = lambda u: advection(u, v)
    for _ in range(steps):
        phi = tvd_rk2_step(phi, flux, dt)
    m = np.asarray(_zero_crossing_mask(phi))
    zz, yy, xx = np.nonzero(m)
    r = (np.sqrt((xx - 20.0) ** 2 + (yy - 20.0) ** 2 + (zz - 20.0) ** 2)
         - np.asarray(phi)[zz, yy, xx]).mean()
    assert abs(r - 8.0) < 0.5
