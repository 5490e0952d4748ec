"""Basis functions vs independent scipy/numpy oracles."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import legendre as scipy_legendre

from diffquantum_tpu.pulses.basis import (
    basis_matrix, bspline_matrix, fourier_matrix, legendre_matrix, poly_matrix)


def test_legendre_matches_scipy():
    x = np.linspace(-1, 1, 41)
    got = np.asarray(legendre_matrix(jnp.asarray(x), 8))
    want = np.stack([scipy_legendre(j)(x) for j in range(8)], axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_bspline_matches_reference_formula():
    # sim_plain.py:52-70 closure semantics, reimplemented independently.
    n_basis = 6
    tau = 1.0 / (n_basis - 2)

    def ref_bspline(b, t):
        l = tau * (b - 1.5) - 1.5 * tau
        r = tau * (b - 1.5) + 1.5 * tau
        if t >= r or t <= l:
            return 0.0
        return (t - l) * (t - r) / (-(1.5 * tau) ** 2)

    ts = np.linspace(0, 1, 33)
    got = np.asarray(bspline_matrix(jnp.asarray(ts), n_basis))
    want = np.array([[ref_bspline(b, t) for b in range(n_basis)] for t in ts])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_bspline_peak_is_one():
    n_basis = 7
    tau = 1.0 / (n_basis - 2)
    centers = np.array([tau * (b - 1.5) for b in range(n_basis)])
    got = np.asarray(bspline_matrix(jnp.asarray(centers), n_basis))
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-12)


def test_poly_and_fourier():
    ts = np.linspace(0, 2, 9)
    p = np.asarray(poly_matrix(jnp.asarray(ts), 4))
    want = np.stack([(ts - 0.5) ** j for j in range(4)], axis=-1)
    np.testing.assert_allclose(p, want, atol=1e-12)

    f = np.asarray(fourier_matrix(jnp.asarray(ts), 6))
    n = 3
    want_c = np.stack([np.cos(2 * np.pi * j * ts) for j in range(n)], -1)
    want_s = np.stack([np.sin(2 * np.pi * j * ts) for j in range(n)], -1)
    np.testing.assert_allclose(f, np.concatenate([want_c, want_s], -1), atol=1e-12)


def test_basis_matrix_normalization():
    # legendre/bspline are normalized by horizon T; poly/fourier use raw t
    # (sim_plain.py:87-94).
    ts = jnp.asarray(np.linspace(0.0, 3.0, 7))
    T = 3.0
    leg = np.asarray(basis_matrix("Legendre", 5, ts, T))
    want = np.stack([scipy_legendre(j)(2 * np.asarray(ts) / T - 1) for j in range(5)], -1)
    np.testing.assert_allclose(leg, want, atol=1e-10)


def test_unknown_basis_raises():
    with pytest.raises(ValueError):
        basis_matrix("chebyshev", 4, jnp.zeros(3), 1.0)
