"""Cross-validation of the three gradient engines (SURVEY.md §4 oracle #3):
adjoint (jax.grad), the paper's MC estimator (in expectation), and central
finite differences must agree."""
import jax
import jax.numpy as jnp
import numpy as np

from diffquantum_tpu.dynamics.hamiltonian import ControlledHamiltonian
from diffquantum_tpu.dynamics.propagator import reference_n_steps
from diffquantum_tpu.gradients.adjoint import energy_and_grad, fidelity_and_grad
from diffquantum_tpu.gradients.fd import fd_energy_grad
from diffquantum_tpu.gradients.mc import envelope_sensitivity, mc_energy_grad
from diffquantum_tpu.measure import Measurement
from diffquantum_tpu.ops import cpx, linalg
from diffquantum_tpu.pulses.basis import basis_matrix
from diffquantum_tpu.pulses.envelope import SimpleEnvelope

F64 = jnp.float64


def small_problem(seed=0):
    n_qubits = 2
    rng = np.random.default_rng(seed)
    H0 = np.zeros((4, 4))
    Hs = [linalg.pauli_string("XI"), linalg.pauli_string("IX"),
          linalg.pauli_string("ZZ")]
    omegas = (np.pi, np.pi, np.pi)
    T = 2.0
    env = SimpleEnvelope(basis="bspline", n_basis=4, omegas=omegas)
    ham = ControlledHamiltonian.create(H0, Hs, dtype=F64)
    coeff = jnp.asarray(rng.standard_normal((3, 4)) * 0.3)
    psi0 = cpx.from_complex(linalg.uniform_superposition(n_qubits), F64)
    m = linalg.pauli_string("ZZ") * (-0.5)
    meas = Measurement.create(m, dtype=F64)
    return ham, env, coeff, psi0, meas, T


def test_adjoint_vs_fd():
    ham, env, coeff, psi0, meas, T = small_problem()
    n_steps = reference_n_steps(10, 0.0, T)
    e, g_adj = energy_and_grad(ham, env, meas.matrix, coeff, psi0, T, n_steps)
    g_fd = fd_energy_grad(ham, env, meas, coeff, psi0, T,
                          jax.random.PRNGKey(0), n_steps, delta=1e-5)
    np.testing.assert_allclose(np.asarray(g_adj), np.asarray(g_fd),
                               rtol=1e-4, atol=1e-7)


def test_envelope_sensitivity_matches_autodiff():
    ham, env, coeff, psi0, meas, T = small_problem(1)
    s = 0.93

    def envelope_at_s(c):
        return env.amplitudes(c, jnp.asarray([s]), T)[:, 0].sum()

    want = jax.grad(envelope_at_s)(coeff)
    got = envelope_sensitivity(env, coeff, s, T)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-10)


def test_envelope_sensitivity_reference_mode():
    env = SimpleEnvelope(basis="poly", n_basis=3, omegas=(1.0, 2.0))
    coeff = jnp.asarray(np.random.default_rng(2).standard_normal((2, 3)))
    s, T = 0.4, 1.0
    got = envelope_sensitivity(env, coeff, s, T, chain="reference")
    phi = np.asarray(basis_matrix("poly", 3, jnp.asarray(s), T))
    # sim_plain.py:224-225: poly gets raw (s-0.5)^j, no sigmoid chain
    np.testing.assert_allclose(np.asarray(got),
                               np.broadcast_to(phi, (2, 3)), atol=1e-12)


def test_mc_estimator_unbiased_matches_adjoint_direction():
    """Averaged MC gradient ≈ T-scaled true gradient (the reference omits
    the U(0,T) Jacobian factor T; with T=2 expect g_mc ≈ g_adj / T up to MC
    noise — check strong cosine similarity and per-coordinate agreement."""
    ham, env, coeff, psi0, meas, T = small_problem(3)
    n_steps = 40
    _, g_adj = energy_and_grad(ham, env, meas.matrix, coeff, psi0, T, n_steps)

    n_mc = 600
    keys = jax.random.split(jax.random.PRNGKey(42), n_mc)
    sample = jax.jit(jax.vmap(lambda k: mc_energy_grad(
        ham, env, meas, coeff, psi0, T, k, n_steps)))
    grads = sample(keys)
    g_mc = np.asarray(grads.mean(axis=0)) * T  # undo the absorbed 1/T

    a, b = g_mc.ravel(), np.asarray(g_adj).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99, cos
    # standard-error-scaled agreement
    se = np.asarray(grads.std(axis=0)).ravel() * T / np.sqrt(n_mc)
    np.testing.assert_array_less(np.abs(a - b), 5 * se + 5e-3)


def test_fidelity_grad_descends():
    # quantum control smoke test: a few gradient steps reduce infidelity
    ham, env, coeff, psi0, meas, T = small_problem(4)
    target = cpx.from_complex(linalg.basis_state(3, 4), F64)
    n_steps = 20
    c = coeff
    l0, _ = fidelity_and_grad(ham, env, target, c, psi0, T, n_steps)
    for _ in range(25):
        _, g = fidelity_and_grad(ham, env, target, c, psi0, T, n_steps)
        c = c - 0.1 * g
    l1, _ = fidelity_and_grad(ham, env, target, c, psi0, T, n_steps)
    assert float(l1) < float(l0)


def test_mc_noisy_sampling_paths_run():
    ham, env, coeff, psi0, meas, T = small_problem(5)
    m_np = cpx.to_complex(meas.matrix)
    meas2 = Measurement.create(m_np, terms=[(m_np, 1.0)], dtype=F64,
                               sampling=True, noisy=True)
    g = mc_energy_grad(ham, env, meas2, coeff, psi0, T,
                       jax.random.PRNGKey(7), 20, sampling=True, noisy=True)
    assert np.all(np.isfinite(np.asarray(g)))


def test_second_order_differentiable():
    """jax.hessian flows through the propagator (beyond the reference's
    first-order-only estimators)."""
    ham, env, coeff, psi0, meas, T = small_problem(6)
    n_steps = 10

    from diffquantum_tpu.dynamics.propagator import evolve
    from diffquantum_tpu.measure import exact_expectation

    def loss(c):
        psi = evolve(ham, env, c, psi0, 0.0, T, horizon=T, n_steps=n_steps)
        return exact_expectation(meas.matrix, psi)

    h = jax.hessian(loss)(coeff)
    assert h.shape == coeff.shape + coeff.shape
    hm = np.asarray(h).reshape(coeff.size, coeff.size)
    # Hessian of a smooth scalar loss is symmetric
    np.testing.assert_allclose(hm, hm.T, atol=1e-8)
    assert np.any(np.abs(hm) > 1e-6)


def test_mc_variance_reduction_strategies():
    """Antithetic and stratified split-time sampling must (a) stay unbiased
    (same mean as iid within noise) and (b) cut the variance of the batch
    mean at FIXED cost. Measured over 24 independent batch means."""
    from diffquantum_tpu.gradients.mc import mc_energy_grad_batch

    ham, env, coeff, psi0, meas, T = small_problem()
    n_samples, n_rep = 8, 24
    keys = jax.random.split(jax.random.PRNGKey(9), n_rep)

    def batch_means(strategy):
        return np.stack([np.asarray(mc_energy_grad_batch(
            ham, env, meas, coeff, psi0, T, k, 12, n_samples,
            strategy=strategy)) for k in keys])

    out = {s: batch_means(s) for s in ("iid", "antithetic", "stratified")}
    var = {s: float(np.mean(np.var(v, axis=0))) for s, v in out.items()}
    mean = {s: v.mean(axis=0) for s, v in out.items()}
    # unbiasedness: strategies agree in expectation (coarse, n_rep*n_samples
    # samples each)
    scale = np.abs(mean["iid"]).max() + 1e-9
    for s in ("antithetic", "stratified"):
        assert np.abs(mean[s] - mean["iid"]).max() < 0.5 * scale, (s, mean)
    # variance: stratified must beat iid clearly; antithetic at least not
    # hurt (its gain depends on the integrand's symmetry)
    assert var["stratified"] < 0.6 * var["iid"], var
    assert var["antithetic"] < 1.2 * var["iid"], var


def test_mc_t_jacobian_scaling():
    """t_jacobian=True scales the estimator by exactly T."""
    from diffquantum_tpu.gradients.mc import mc_energy_grad

    ham, env, coeff, psi0, meas, T = small_problem()
    k = jax.random.PRNGKey(3)
    g0 = np.asarray(mc_energy_grad(ham, env, meas, coeff, psi0, T, k, 12))
    g1 = np.asarray(mc_energy_grad(ham, env, meas, coeff, psi0, T, k, 12,
                                   t_jacobian=True))
    np.testing.assert_allclose(g1, g0 * T, rtol=1e-12)
