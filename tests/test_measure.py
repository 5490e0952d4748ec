"""Measurement layer (CP representation): exact vs sampled expectations,
noise model."""
import jax
import jax.numpy as jnp
import numpy as np

from diffquantum_tpu.measure import (Measurement, PauliTermSet,
                                     exact_expectation, measurement_noise,
                                     stochastic_measure)
from diffquantum_tpu.ops import cpx, linalg

F64 = jnp.float64


def test_exact_expectation_batched():
    rng = np.random.default_rng(0)
    m = linalg.pauli_string("ZZ")
    psis = rng.standard_normal((5, 4)) + 1j * rng.standard_normal((5, 4))
    psis /= np.linalg.norm(psis, axis=1, keepdims=True)
    got = np.asarray(exact_expectation(cpx.from_complex(m, F64),
                                       cpx.from_complex(psis, F64)))
    want = np.array([np.vdot(p, m @ p).real for p in psis])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_stochastic_measure_converges_to_exact():
    # Estimator is unbiased: with many shots it approaches <psi|M|psi>
    # (sim_plain.py:101-117 semantics).
    rng = np.random.default_rng(1)
    terms_np = [(linalg.pauli_string("ZZ"), 0.5),
                (linalg.pauli_string("XI"), -0.3),
                (np.eye(4), 0.25)]
    m_total = sum(w * m for m, w in terms_np)
    psi = rng.standard_normal(4) + 1j * rng.standard_normal(4)
    psi /= np.linalg.norm(psi)

    terms = PauliTermSet.create(terms_np, dtype=F64)
    got = float(stochastic_measure(terms, cpx.from_complex(psi, F64),
                                   jax.random.PRNGKey(0), per_pauli=200_000))
    want = float(np.vdot(psi, m_total @ psi).real)
    assert abs(got - want) < 5e-3, (got, want)


def test_measurement_noise_scale():
    keys = jax.random.split(jax.random.PRNGKey(2), 4000)
    vals = jax.vmap(lambda k: measurement_noise(jnp.asarray(10.0), k))(keys)
    vals = np.asarray(vals)
    assert abs(vals.mean() - 10.0) < 0.1          # unbiased
    assert abs(vals.std() - 2.0) < 0.15           # sigma = |v|/5 = 2


def test_measurement_object_paths():
    z = linalg.pauli_string("Z")
    psi = cpx.from_complex(linalg.basis_state(0, 2), F64)
    exact = Measurement.create(z, dtype=F64)
    assert abs(float(exact.expectation(psi)) - 1.0) < 1e-12
    noisy = Measurement.create(z, terms=[(z, 1.0)], dtype=F64,
                               sampling=True, noisy=True)
    v = noisy.expectation(psi, key=jax.random.PRNGKey(3))
    assert np.isfinite(float(v))


def test_sampling_diag_without_terms_falls_back():
    """Measurement.create_diagonal(..., sampling=True) with no diag_terms
    must sample the diagonal directly (one implicit term), not crash."""
    import jax
    from diffquantum_tpu.measure import Measurement
    diag = np.array([0.0, 1.0, 2.0, 3.0])
    m = Measurement.create_diagonal(diag, dtype=jnp.float64, sampling=True,
                                    per_pauli=20000)
    psi = cpx.from_complex(np.array([0.5, 0.5, 0.5, 0.5]), jnp.float64)
    val = float(m.expectation(psi, key=jax.random.PRNGKey(0)))
    assert abs(val - 1.5) < 0.05, val
