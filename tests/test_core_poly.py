"""Polynomial root-finder tests (cf. reference cpp/test/Sara/Core polynomial
tests; device-side design per sara_tpu/core/poly.py docstring)."""

import jax.numpy as jnp
import numpy as np

from sara_tpu.core import poly


def test_polyval_matches_numpy(rng):
    c = rng.normal(size=(5,))
    x = rng.normal(size=(7,))
    got = np.asarray(poly.polyval(jnp.asarray(c), jnp.asarray(x)))
    np.testing.assert_allclose(got, np.polyval(c, x), atol=1e-9)


def test_real_roots_cubic(rng):
    roots = np.array([-3.0, 1.0, 2.0])
    c = jnp.asarray(np.poly(roots))
    r, v = poly.real_roots_bracketed(c[None], max_roots=3)
    r = np.sort(np.asarray(r[0])[np.asarray(v[0])])
    np.testing.assert_allclose(r, roots, atol=1e-6)


def test_real_roots_degree10_batch(rng):
    """Degree-10 polynomials with known real roots — the 5-pt solver shape."""
    B = 16
    all_roots = rng.uniform(-2.0, 2.0, size=(B, 10))
    coeffs = np.stack([np.poly(r) for r in all_roots])
    r, v = poly.real_roots_bracketed(jnp.asarray(coeffs), max_roots=10,
                                     grid_size=512, bisect_iters=60)
    for b in range(B):
        got = np.sort(np.asarray(r[b])[np.asarray(v[b])])
        want = np.sort(all_roots[b])
        # Bracketing on a finite grid may miss near-double roots; require most.
        assert len(got) >= 8
        for g in got:
            assert np.min(np.abs(want - g)) < 1e-4


def test_real_roots_no_real():
    # x^2 + 1: no real roots.
    c = jnp.asarray([1.0, 0.0, 1.0])
    r, v = poly.real_roots_bracketed(c[None], max_roots=2)
    assert not np.any(np.asarray(v))


def test_roots_quadratic(rng):
    r, v = poly.roots_quadratic(jnp.asarray(2.0), jnp.asarray(-6.0), jnp.asarray(4.0))
    got = np.sort(np.asarray(r))
    np.testing.assert_allclose(got, [1.0, 2.0], atol=1e-9)
    assert np.all(np.asarray(v))


def test_roots_cubic_all_real():
    # (x-1)(x-2)(x+3) = x^3 - 7x + 6
    r, v = poly.roots_cubic(jnp.asarray(1.0), jnp.asarray(0.0),
                            jnp.asarray(-7.0), jnp.asarray(6.0))
    got = np.sort(np.asarray(r)[np.asarray(v)])
    np.testing.assert_allclose(got, [-3.0, 1.0, 2.0], atol=1e-7)


def test_roots_cubic_one_real():
    # (x-2)(x^2+1) = x^3 - 2x^2 + x - 2
    r, v = poly.roots_cubic(jnp.asarray(1.0), jnp.asarray(-2.0),
                            jnp.asarray(1.0), jnp.asarray(-2.0))
    got = np.asarray(r)[np.asarray(v)]
    assert len(got) >= 1
    np.testing.assert_allclose(got[0], 2.0, atol=1e-7)


def test_companion_matrix_eigvals(rng):
    roots = np.array([-1.5, 0.5, 3.0])
    c = jnp.asarray(np.poly(roots))
    comp = np.asarray(poly.companion_matrix(c))
    got = np.sort(np.linalg.eigvals(comp).real)
    np.testing.assert_allclose(got, roots, atol=1e-9)
