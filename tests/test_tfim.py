"""TFIM model family + matrix-free Pauli-string observables.

Oracles: dense matrices built with linalg.pauli_string for every
string-path check; dense diagonalization for the free-fermion formula;
the exactly-solvable ground energy for VQE convergence.
"""
import jax
import jax.numpy as jnp
import numpy as np

from diffquantum_tpu.measure import (Measurement, PauliStringSet,
                                     stochastic_measure_strings)
from diffquantum_tpu.models import tfim
from diffquantum_tpu.ops import cpx, linalg

F64 = jnp.float64


def _dense_from_terms(terms):
    return sum(w * linalg.pauli_string(lbl) for lbl, w in terms)


def _rand_state(n, seed):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(2**n) + 1j * rng.standard_normal(2**n)
    return v / np.linalg.norm(v)


def test_pauli_string_expectation_vs_dense():
    terms = [("ZZI", -1.0), ("IZZ", 0.7), ("XII", -0.5), ("IYI", 0.9),
             ("XYZ", 0.3), ("YYI", -0.4), ("III", 0.25)]
    ps = PauliStringSet.create(terms, dtype=F64)
    m = _dense_from_terms(terms)
    for seed in range(3):
        v = _rand_state(3, seed)
        want = np.real(v.conj() @ m @ v)
        got = float(ps.expectation(cpx.from_complex(v, F64)))
        np.testing.assert_allclose(got, want, atol=1e-12)
    # batched kets
    vs = np.stack([_rand_state(3, s) for s in range(4)])
    got = np.asarray(ps.expectation(cpx.from_complex(vs, F64)))
    want = np.real(np.einsum("bi,ij,bj->b", vs.conj(), m, vs))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_pauli_string_apply_vs_dense():
    terms = [("ZY", 0.8), ("XX", -0.6), ("IZ", 0.5), ("YX", 0.1)]
    ps = PauliStringSet.create(terms, dtype=F64)
    m = _dense_from_terms(terms)
    v = _rand_state(2, 7)
    got = cpx.to_complex(ps.apply(cpx.from_complex(v, F64)))
    np.testing.assert_allclose(got, m @ v, atol=1e-12)


def test_sampled_strings_unbiased():
    terms = [("ZZ", -1.0), ("XI", -0.6), ("IY", 0.4)]
    ps = PauliStringSet.create(terms, dtype=F64)
    m = _dense_from_terms(terms)
    v = _rand_state(2, 1)
    want = np.real(v.conj() @ m @ v)
    est = float(stochastic_measure_strings(
        ps, cpx.from_complex(v, F64), jax.random.PRNGKey(0),
        per_pauli=40000))
    assert abs(est - want) < 0.02, (est, want)


def test_free_fermion_oracle_vs_dense():
    for n in (2, 3, 5, 7):
        for (J, h) in ((1.0, 1.0), (0.7, 1.3)):
            m = _dense_from_terms(
                [("".join("Z" if q in (i, i + 1) else "I"
                          for q in range(n)), -J) for i in range(n - 1)]
                + [("".join("X" if q == p else "I"
                            for q in range(n)), -h) for p in range(n)])
            want = float(np.linalg.eigvalsh(m)[0])
            got = tfim.exact_ground_energy(n, J, h)
            np.testing.assert_allclose(got, want, atol=1e-10)


def test_tfim_vqe_reaches_ground_state():
    prob = tfim.build_tfim(4, J=1.0, h=1.0, n_basis=6, dtype=F64)
    from diffquantum_tpu.train import TrainConfig, train_energy
    cfg = TrainConfig(n_basis=6, n_epoch=250, lr=5e-2, grad_mode="adjoint",
                      dtype="float64", seed=0)
    res = train_energy(prob.ham, prob.envelope, prob.measurement, prob.psi0,
                       prob.T, cfg, lam_min=prob.exact_ground)
    # losses_energy = gap to the free-fermion exact ground energy
    assert res.losses_energy[-1] < 0.05, res.losses_energy[-1]


def test_tfim_structured_matches_dense_loss():
    """Structured (matrix-free) TFIM evolution + string measurement equals
    the dense-path value."""
    from diffquantum_tpu.dynamics.propagator import evolve
    rng = np.random.default_rng(0)
    pd = tfim.build_tfim(5, dense=True, dtype=F64)
    ps_ = tfim.build_tfim(5, dense=False, dtype=F64)
    coeff = jnp.asarray(rng.standard_normal(pd.envelope.coeff_shape) * 0.4)
    a = evolve(pd.ham, pd.envelope, coeff, pd.psi0, 0.0, pd.T,
               horizon=pd.T, n_steps=300, backend="expm")
    b = evolve(ps_.ham, ps_.envelope, coeff, ps_.psi0, 0.0, ps_.T,
               horizon=ps_.T, n_steps=300, backend="product")
    ea = float(pd.measurement.expectation(a))
    eb = float(ps_.measurement.expectation(b))
    np.testing.assert_allclose(ea, eb, atol=5e-5)


def test_tfim_mc_gradient_unbiased():
    """MC estimator mean over many split times matches the adjoint gradient
    on the string-measured TFIM."""
    from diffquantum_tpu.gradients.adjoint import energy_and_grad
    from diffquantum_tpu.gradients.mc import mc_energy_grad_batch
    prob = tfim.build_tfim(3, n_basis=4, dtype=F64)
    rng = np.random.default_rng(5)
    coeff = jnp.asarray(rng.standard_normal(prob.envelope.coeff_shape) * 0.3)
    n_steps = 40
    _, g_adj = energy_and_grad(prob.ham, prob.envelope, prob.measurement,
                               coeff, prob.psi0, prob.T, n_steps)
    g_mc = mc_energy_grad_batch(prob.ham, prob.envelope, prob.measurement,
                                coeff, prob.psi0, prob.T,
                                jax.random.PRNGKey(0), n_steps,
                                n_samples=600, strategy="stratified")
    # correlation between estimator mean and exact gradient
    a = np.asarray(g_adj).ravel()
    b = np.asarray(g_mc).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)
    assert cos > 0.95, cos


def test_heisenberg_vqe_descends_toward_ground():
    """XXZ chain with the two-quadrature X+Y site drives (the same-qubit
    non-commuting pair) + string-measured cost."""
    from diffquantum_tpu.models import heisenberg
    from diffquantum_tpu.train import TrainConfig, train_energy
    prob = heisenberg.build_heisenberg(4, n_basis=5, dtype=F64)
    e0 = heisenberg.exact_ground_energy(4)
    cfg = TrainConfig(n_basis=5, n_epoch=220, lr=5e-2, grad_mode="adjoint",
                      dtype="float64", seed=1)
    res = train_energy(prob.ham, prob.envelope, prob.measurement, prob.psi0,
                       prob.T, cfg, lam_min=e0)
    # start from the Neel product state (energy J*delta*(n-1) XX/YY-blind);
    # training must close most of the gap to the true entangled ground state
    assert res.losses_raw[-1] < 0.25 * e0 + 0.75 * res.losses_raw[0], (
        res.losses_raw[0], res.losses_raw[-1], e0)
    assert res.losses_energy[-1] < res.losses_energy[0] * 0.3
