"""Open-system dynamics: master-equation engine vs analytic decay laws and
an adaptive-ODE oracle; MCWF trajectories vs the master equation; gradients
through the dissipative evolution (beyond-reference capability — the
reference's dynamics are always unitary, `/root/reference/sim_plain.py:330`).
"""
import jax
import jax.numpy as jnp
import numpy as np

from diffquantum_tpu.dynamics.hamiltonian import ControlledHamiltonian
from diffquantum_tpu.dynamics.lindblad import (CollapseSet,
                                               amplitude_damping,
                                               dephasing,
                                               density_from_trajectories,
                                               evolve_lindblad, evolve_mcwf,
                                               expectation_rho)
from diffquantum_tpu.ops import cpx, linalg
from diffquantum_tpu.pulses.envelope import SimpleEnvelope
import pytest

F64 = jnp.float64


def _rho(psi: np.ndarray) -> cpx.CP:
    r = np.outer(psi, psi.conj())
    return cpx.from_complex(r, F64)


def _one_qubit_ham(dtype=F64):
    ham = ControlledHamiltonian.create(np.zeros((2, 2)), [linalg.X],
                                       dtype=dtype)
    env = SimpleEnvelope(basis="bspline", n_basis=4, omegas=(np.pi,))
    return ham, env


def test_amplitude_damping_analytic():
    """H = 0, c = sqrt(gamma)|0><1|: p1(t) = e^{-gamma t},
    rho01(t) = rho01(0) e^{-gamma t / 2}."""
    ham, env = _one_qubit_ham()
    gamma, T = 0.5, 2.0
    c = CollapseSet.create([amplitude_damping(gamma, 0, 1)], dtype=F64)
    coeff = jnp.zeros((1, 4), F64)  # sigmoid(0)*2-1 = 0 -> u = 0

    psi = np.array([0.6, 0.8j])
    rho = evolve_lindblad(ham, env, coeff, _rho(psi), c, 0.0, T,
                          horizon=T, n_steps=200)
    r = cpx.to_complex(rho)
    p1_0 = abs(psi[1]) ** 2
    np.testing.assert_allclose(r[1, 1].real, p1_0 * np.exp(-gamma * T),
                               atol=1e-7)
    np.testing.assert_allclose(np.trace(r).real, 1.0, atol=1e-9)
    rho01_0 = psi[0] * np.conj(psi[1])
    np.testing.assert_allclose(r[0, 1], rho01_0 * np.exp(-gamma * T / 2),
                               atol=1e-7)


def test_dephasing_analytic():
    """c = sqrt(gamma/2) Z: <X(t)> = e^{-gamma t} for |+>."""
    ham, env = _one_qubit_ham()
    gamma, T = 0.8, 1.5
    c = CollapseSet.create([dephasing(gamma, 0, 1)], dtype=F64)
    coeff = jnp.zeros((1, 4), F64)
    plus = np.array([1.0, 1.0]) / np.sqrt(2)
    rho = evolve_lindblad(ham, env, coeff, _rho(plus), c, 0.0, T,
                          horizon=T, n_steps=150)
    x = expectation_rho(cpx.from_complex(linalg.X, F64), rho)
    np.testing.assert_allclose(float(x), np.exp(-gamma * T), atol=1e-7)


def test_driven_lindblad_vs_ode_oracle():
    """2 qubits, X drives + ZZ coupling, amplitude damping on both sites:
    the per-step exp(dt L) chain must track scipy's adaptive integration of
    the true time-dependent master equation to piecewise-constant-grid
    accuracy."""
    from scipy.integrate import solve_ivp

    rng = np.random.default_rng(1)
    H0 = 0.4 * linalg.pauli_string("ZZ")
    Hs = [linalg.pauli_string("XI"), linalg.pauli_string("IX")]
    ham = ControlledHamiltonian.create(H0, Hs, dtype=F64)
    env = SimpleEnvelope(basis="bspline", n_basis=4, omegas=(np.pi, np.pi))
    coeff = jnp.asarray(rng.standard_normal((2, 4)) * 0.5)
    T = 1.5
    c_np = [amplitude_damping(0.3, 0, 2), amplitude_damping(0.2, 1, 2)]
    c = CollapseSet.create(c_np, dtype=F64)

    psi0 = linalg.uniform_superposition(2)

    # oracle: vectorized rho, continuous-time u(t) from the same envelope
    d = 4
    K = sum(ck.conj().T @ ck for ck in c_np)
    diss = sum(np.kron(ck, ck.conj()) for ck in c_np) \
        - 0.5 * (np.kron(K, np.eye(d)) + np.kron(np.eye(d), K.T))

    def rhs(t, v):
        u = np.asarray(env.amplitudes(coeff, jnp.asarray([t]), T))[:, 0]
        H = np.asarray(H0, complex) + u[0] * Hs[0] + u[1] * Hs[1]
        A = -1j * (np.kron(H, np.eye(d)) - np.kron(np.eye(d), H.T)) + diss
        return A @ v

    v0 = np.outer(psi0, psi0.conj()).reshape(-1)
    sol = solve_ivp(rhs, (0.0, T), v0, rtol=1e-10, atol=1e-12)
    rho_ref = sol.y[:, -1].reshape(d, d)

    errs = []
    for n_steps in (300, 600, 1200):
        rho = evolve_lindblad(ham, env, coeff, _rho(psi0), c, 0.0, T,
                              horizon=T, n_steps=n_steps)
        errs.append(np.abs(cpx.to_complex(rho) - rho_ref).max())
    assert errs[-1] < 2e-4, errs
    # first-order convergence of the left-endpoint piecewise-constant grid
    # toward the TRUE time-ordered open dynamics (same law as the unitary
    # reference semantics, tests/test_ode_oracle.py)
    for a, b in zip(errs, errs[1:]):
        assert 1.5 < a / b < 2.6, errs


def test_mcwf_matches_master_equation():
    """Trajectory-mean density matrix vs the dense master equation on a
    driven, damped qubit."""
    ham, env = _one_qubit_ham()
    rng = np.random.default_rng(2)
    coeff = jnp.asarray(rng.standard_normal((1, 4)) * 0.7)
    T, n_steps = 2.0, 400
    c = CollapseSet.create([amplitude_damping(0.4, 0, 1)], dtype=F64)
    psi0 = np.array([1.0, 0.0])

    rho = evolve_lindblad(ham, env, coeff, _rho(psi0), c, 0.0, T,
                          horizon=T, n_steps=n_steps)
    psis = evolve_mcwf(ham, env, coeff, cpx.from_complex(psi0, F64), c,
                       0.0, T, horizon=T, n_steps=n_steps,
                       key=jax.random.PRNGKey(0), n_traj=3000)
    norms = np.asarray(cpx.norm2(psis))
    np.testing.assert_allclose(norms, 1.0, atol=1e-9)  # unit-norm endpoints
    rho_mc = density_from_trajectories(psis)
    err = np.abs(cpx.to_complex(rho_mc) - cpx.to_complex(rho)).max()
    assert err < 0.05, err  # 3000 trajectories -> ~1/sqrt(3000) + O(dt)


def test_lindblad_gradient_matches_fd():
    """jax.grad through the dissipative evolution vs central differences."""
    ham, env = _one_qubit_ham()
    c = CollapseSet.create([amplitude_damping(0.3, 0, 1)], dtype=F64)
    T, n_steps = 1.0, 60
    target_diag = jnp.asarray([0.0, 1.0], F64)
    rho0 = _rho(np.array([1.0, 0.0]))

    def loss(cf):
        rho = evolve_lindblad(ham, env, cf, rho0, c, 0.0, T,
                              horizon=T, n_steps=n_steps)
        return 1.0 - expectation_rho(target_diag, rho)

    coeff = jnp.asarray(np.random.default_rng(3).standard_normal((1, 4)) * .3)
    g = jax.grad(loss)(coeff)
    eps = 1e-6
    for i in range(4):
        e = jnp.zeros_like(coeff).at[0, i].set(eps)
        fd = (loss(coeff + e) - loss(coeff - e)) / (2 * eps)
        np.testing.assert_allclose(float(g[0, i]), float(fd),
                                   rtol=1e-5, atol=1e-8)


def test_zero_noise_limit_matches_unitary():
    """gamma -> 0 recovers the closed-system propagator."""
    from diffquantum_tpu.dynamics.propagator import evolve
    ham, env = _one_qubit_ham()
    rng = np.random.default_rng(4)
    coeff = jnp.asarray(rng.standard_normal((1, 4)) * 0.5)
    T, n_steps = 1.0, 100
    c = CollapseSet.create([amplitude_damping(1e-12, 0, 1)], dtype=F64)
    psi0 = np.array([1.0, 0.0])
    rho = evolve_lindblad(ham, env, coeff, _rho(psi0), c, 0.0, T,
                          horizon=T, n_steps=n_steps)
    psi = evolve(ham, env, coeff, cpx.from_complex(psi0, F64), 0.0, T,
                 horizon=T, n_steps=n_steps, backend="expm")
    rho_u = np.outer(cpx.to_complex(psi), cpx.to_complex(psi).conj())
    assert np.abs(cpx.to_complex(rho) - rho_u).max() < 1e-8


def test_structured_mcwf_matches_dense_master_equation():
    """Matrix-free quantum-jump trajectories (product engine + diagonal
    decay + masked-gather jumps) vs the dense Lindblad solution on a driven
    2-qubit system with T1 on both sites and dephasing on one."""
    from diffquantum_tpu.dynamics.hamiltonian import TermStructure
    from diffquantum_tpu.dynamics.lindblad import (StructuredNoise,
                                                   evolve_mcwf_structured)

    n = 2
    structure = (
        TermStructure(kind="diag", diag=linalg.pauli_string("ZZ")
                      .diagonal().real),
        TermStructure(kind="1q", qubit=0, local=linalg.X),
        TermStructure(kind="1q", qubit=1, local=linalg.X),
    )
    Hs = [np.diag(linalg.pauli_string("ZZ").diagonal().real),
          linalg.pauli_string("XI"), linalg.pauli_string("IX")]
    ham = ControlledHamiltonian.create(
        np.zeros((4, 4)), Hs, dtype=F64, structure=structure,
        h0_structure=TermStructure(kind="diag", diag=np.zeros(4)))
    env = SimpleEnvelope(basis="bspline", n_basis=4,
                         omegas=(np.pi,) * 3)
    rng = np.random.default_rng(0)
    coeff = jnp.asarray(rng.standard_normal((3, 4)) * 0.6)
    T, n_steps = 1.5, 300
    noise = StructuredNoise(n, t1=[(0, 0.4), (1, 0.25)],
                            dephasing=[(1, 0.3)])

    psi0 = cpx.from_complex(linalg.basis_state(3, 4), F64)  # |11>
    rho0 = _rho(np.eye(4)[3])
    c = CollapseSet.create(noise.dense_collapse_ops(), dtype=F64)
    rho = evolve_lindblad(ham, env, coeff, rho0, c, 0.0, T,
                          horizon=T, n_steps=n_steps)

    psis = evolve_mcwf_structured(ham, env, coeff, psi0, noise, 0.0, T,
                                  horizon=T, n_steps=n_steps,
                                  key=jax.random.PRNGKey(1), n_traj=3000)
    np.testing.assert_allclose(np.asarray(cpx.norm2(psis)), 1.0, atol=1e-9)
    rho_mc = density_from_trajectories(psis)
    err = np.abs(cpx.to_complex(rho_mc) - cpx.to_complex(rho)).max()
    assert err < 0.06, err


def test_structured_mcwf_zero_noise_limit():
    """gamma -> 0: every trajectory equals the closed product evolution."""
    from diffquantum_tpu.dynamics.hamiltonian import TermStructure
    from diffquantum_tpu.dynamics.lindblad import (StructuredNoise,
                                                   evolve_mcwf_structured)
    from diffquantum_tpu.dynamics.product import evolve_product

    structure = (TermStructure(kind="1q", qubit=0, local=linalg.X),)
    ham = ControlledHamiltonian.create(
        np.zeros((2, 2)), [linalg.X], dtype=F64, structure=structure,
        h0_structure=TermStructure(kind="diag", diag=np.zeros(2)))
    env = SimpleEnvelope(basis="bspline", n_basis=4, omegas=(np.pi,))
    coeff = jnp.asarray(np.random.default_rng(1).standard_normal((1, 4)))
    psi0 = cpx.from_complex(np.array([1.0, 0.0]), F64)
    T, n_steps = 1.0, 100
    psis = evolve_mcwf_structured(
        ham, env, coeff, psi0, StructuredNoise(1, t1=[(0, 1e-14)]),
        0.0, T, horizon=T, n_steps=n_steps, key=jax.random.PRNGKey(0),
        n_traj=4)
    ref = evolve_product(ham, env, coeff, psi0, 0.0, T, horizon=T,
                         n_steps=n_steps)
    for i in range(4):
        np.testing.assert_allclose(cpx.to_complex(psis[i]),
                                   cpx.to_complex(ref), atol=1e-8)


def test_structured_mcwf_large_n_smoke():
    """14 qubits matrix-free: runs, unit norms, finite observable."""
    from diffquantum_tpu.dynamics.lindblad import (StructuredNoise,
                                                   evolve_mcwf_structured)
    from diffquantum_tpu.models import maxcut
    prob = maxcut.build_maxcut(14, maxcut.ring_graph(14), n_basis=4,
                               dense=False, dtype=F64)
    rng = np.random.default_rng(0)
    coeff = jnp.asarray(rng.standard_normal(prob.envelope.coeff_shape) * .3)
    noise = StructuredNoise(14, t1=[(q, 0.2) for q in range(14)])
    psis = evolve_mcwf_structured(prob.ham, prob.envelope, coeff, prob.psi0,
                                  noise, 0.0, prob.T, horizon=prob.T,
                                  n_steps=20, key=jax.random.PRNGKey(2),
                                  n_traj=8)
    assert psis.re.shape == (8, 2**14)
    np.testing.assert_allclose(np.asarray(cpx.norm2(psis)), 1.0, atol=1e-9)
    e = np.asarray(jnp.mean(jnp.sum(cpx.abs2(psis)
                                    * prob.measurement.diag, axis=-1)))
    assert np.isfinite(e)


def test_expectation_rho_strings_and_target():
    """tr(M rho) for Pauli-string and target Measurement forms, vs dense."""
    from diffquantum_tpu.dynamics.lindblad import expectation_rho
    from diffquantum_tpu.measure import Measurement
    rng = np.random.default_rng(0)
    a = rng.standard_normal((4, 4)) + 1j * rng.standard_normal((4, 4))
    rho_c = a @ a.conj().T
    rho_c /= np.trace(rho_c)
    rho = cpx.from_complex(rho_c, F64)

    terms = [("ZZ", -1.0), ("XI", 0.7), ("IY", -0.3), ("XY", 0.2)]
    m = sum(w * linalg.pauli_string(l) for l, w in terms)
    ms = Measurement.create_strings(terms, dtype=F64)
    np.testing.assert_allclose(float(expectation_rho(ms, rho)),
                               np.real(np.trace(m @ rho_c)), atol=1e-12)

    t = rng.standard_normal(4) + 1j * rng.standard_normal(4)
    t /= np.linalg.norm(t)
    mt = Measurement.create_target(t, dtype=F64)
    np.testing.assert_allclose(float(expectation_rho(mt, rho)),
                               np.real(t.conj() @ rho_c @ t), atol=1e-12)


def _structured_noisy_problem(n=2, dtype=F64, seed=0, with_t1=True):
    from diffquantum_tpu.dynamics.hamiltonian import TermStructure
    from diffquantum_tpu.dynamics.lindblad import StructuredNoise
    d = 2**n
    structure = [TermStructure(
        kind="diag", diag=linalg.zz_diagonal(n, i, (i + 1) % n))
        for i in range(n - 1)]
    for q in range(n):
        structure.append(TermStructure(kind="1q", qubit=q, local=linalg.X))
    ham = ControlledHamiltonian.create_structured(
        d, tuple(structure),
        h0_structure=TermStructure(kind="diag",
                                   diag=0.3 * np.arange(d) / d),
        dtype=dtype)
    env = SimpleEnvelope(basis="bspline", n_basis=4,
                         omegas=(np.pi,) * len(structure))
    rng = np.random.default_rng(seed)
    coeff = jnp.asarray(rng.standard_normal(env.coeff_shape) * 0.5,
                        dtype=dtype)
    t1 = [(0, 0.35)] if with_t1 else []
    noise = StructuredNoise(n, t1=t1, dephasing=[(n - 1, 0.4)])
    return ham, env, coeff, noise


def _dense_twin(ham, dtype=F64):
    """Dense ControlledHamiltonian with identical physics (for the
    evolve_lindblad oracle)."""
    from diffquantum_tpu.dynamics.hamiltonian import TermStructure
    n = ham.n_qubits
    Hs = []
    for st in ham.structure:
        if st.kind == "diag":
            Hs.append(np.diag(np.asarray(st.diag)))
        else:
            Hs.append(linalg.op_on_qubits(np.asarray(st.local),
                                          [st.qubit], n))
    h0 = np.diag(np.asarray(ham.h0_structure.diag))
    return ControlledHamiltonian.create(h0, Hs, dtype=dtype)


def test_lindblad_structured_matches_dense():
    """Strang-split structured master equation (exact per-qubit channel
    maps + two-sided structured unitary step) vs the dense exp(dt L)
    engine on a driven 3-qubit system with T1 + dephasing."""
    from diffquantum_tpu.dynamics.lindblad import evolve_lindblad_structured

    ham, env, coeff, noise = _structured_noisy_problem(n=3, seed=2)
    dham = _dense_twin(ham)
    T, n_steps = 1.2, 400
    psi = np.zeros(8, complex)
    psi[5] = 1.0
    rho0 = _rho(psi)
    c = CollapseSet.create(noise.dense_collapse_ops(), dtype=F64)
    want = evolve_lindblad(dham, env, coeff, rho0, c, 0.0, T, horizon=T,
                           n_steps=n_steps)
    got = evolve_lindblad_structured(ham, env, coeff, rho0, noise, 0.0, T,
                                     horizon=T, n_steps=n_steps)
    err = np.abs(cpx.to_complex(got) - cpx.to_complex(want)).max()
    assert err < 5e-5, err  # O(dt^2) splitting difference
    np.testing.assert_allclose(np.trace(cpx.to_complex(got)).real, 1.0,
                               atol=1e-8)


@pytest.mark.slow
def test_lindblad_structured_gradient():
    """Gradients through the structured dissipative evolution: (a) finite
    differences on its own loss, (b) agreement with the dense-engine
    gradient."""
    from diffquantum_tpu.dynamics.lindblad import evolve_lindblad_structured

    ham, env, coeff, noise = _structured_noisy_problem(n=2, seed=3)
    dham = _dense_twin(ham)
    T, n_steps = 1.0, 200
    plus = np.full(4, 0.5)
    rho0 = _rho(plus)
    w = jnp.asarray(np.linspace(-1, 1, 4), F64)
    c = CollapseSet.create(noise.dense_collapse_ops(), dtype=F64)

    def loss_s(cc):
        rho = evolve_lindblad_structured(ham, env, cc, rho0, noise, 0.0, T,
                                         horizon=T, n_steps=n_steps)
        return expectation_rho(w, rho)

    def loss_d(cc):
        rho = evolve_lindblad(dham, env, cc, rho0, c, 0.0, T, horizon=T,
                              n_steps=n_steps)
        return expectation_rho(w, rho)

    g_s = jax.grad(loss_s)(coeff)
    g_d = jax.grad(loss_d)(coeff)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d), rtol=2e-3,
                               atol=2e-5)
    rng = np.random.default_rng(0)
    direction = jnp.asarray(rng.standard_normal(coeff.shape), F64)
    eps = 1e-5
    fd = (float(loss_s(coeff + eps * direction))
          - float(loss_s(coeff - eps * direction))) / (2 * eps)
    an = float(jnp.sum(g_s * direction))
    np.testing.assert_allclose(an, fd, rtol=1e-5, atol=1e-8)


@pytest.mark.slow
def test_dephasing_trajectories_match_master_equation():
    """Random-Z-phase unitary unraveling of pure dephasing: trajectory-mean
    density vs the dense master equation (statistical tolerance), and the
    pathwise gradient tracks the Lindblad gradient."""
    from diffquantum_tpu.dynamics.lindblad import (
        evolve_dephasing_trajectories)

    ham, env, coeff, noise = _structured_noisy_problem(n=2, seed=4,
                                                      with_t1=False)
    dham = _dense_twin(ham)
    T, n_steps = 1.2, 60
    psi0 = cpx.from_complex(np.full(4, 0.5), F64)
    rho0 = _rho(np.full(4, 0.5))
    c = CollapseSet.create(noise.dense_collapse_ops(), dtype=F64)
    rho = evolve_lindblad(dham, env, coeff, rho0, c, 0.0, T, horizon=T,
                          n_steps=400)

    psis = evolve_dephasing_trajectories(
        ham, env, coeff, psi0, noise, 0.0, T, horizon=T, n_steps=n_steps,
        key=jax.random.PRNGKey(5), n_traj=4000)
    np.testing.assert_allclose(np.asarray(cpx.norm2(psis)), 1.0, atol=1e-9)
    rho_tr = density_from_trajectories(psis)
    err = np.abs(cpx.to_complex(rho_tr) - cpx.to_complex(rho)).max()
    assert err < 0.05, err

    # pathwise (reparameterized) gradient vs the Lindblad gradient
    w = jnp.asarray(np.linspace(-1, 1, 4), F64)

    def loss_traj(cc):
        ps = evolve_dephasing_trajectories(
            ham, env, cc, psi0, noise, 0.0, T, horizon=T, n_steps=n_steps,
            key=jax.random.PRNGKey(7), n_traj=6000)
        vals = jnp.sum(cpx.abs2(ps) * w, axis=-1)
        return vals.mean()

    def loss_d(cc):
        r = evolve_lindblad(dham, env, cc, rho0, c, 0.0, T, horizon=T,
                            n_steps=400)
        return expectation_rho(w, r)

    g_t = np.asarray(jax.grad(loss_traj)(coeff))
    g_d = np.asarray(jax.grad(loss_d)(coeff))
    denom = np.linalg.norm(g_d)
    # Monte-Carlo estimate: O(1/sqrt(n_traj)) noise around the true
    # gradient — check magnitude agreement loosely and direction tightly
    assert np.linalg.norm(g_t - g_d) / denom < 0.35, (g_t, g_d)
    cosine = float(np.sum(g_t * g_d)) / (np.linalg.norm(g_t) * denom)
    assert cosine > 0.9, cosine


def test_dephasing_trajectories_rejects_t1():
    import pytest
    from diffquantum_tpu.dynamics.lindblad import (
        evolve_dephasing_trajectories)
    ham, env, coeff, noise = _structured_noisy_problem(n=2, with_t1=True)
    psi0 = cpx.from_complex(np.full(4, 0.5), F64)
    with pytest.raises(ValueError, match="dephasing only"):
        evolve_dephasing_trajectories(ham, env, coeff, psi0, noise, 0.0,
                                      1.0, horizon=1.0, n_steps=10,
                                      key=jax.random.PRNGKey(0), n_traj=4)


@pytest.mark.slow
def test_noise_aware_training_structured_11q():
    """Noise-aware pulse optimization past dense-operator sizes: a few
    Adam steps through evolve_lindblad_structured at 11 qubits (no dense
    operator ever built) decrease the noisy objective."""
    import optax
    from diffquantum_tpu.dynamics.lindblad import evolve_lindblad_structured

    F32 = jnp.float32
    ham, env, coeff, noise = _structured_noisy_problem(n=11, dtype=F32,
                                                      seed=5)
    d = 2**11
    T, n_steps = 0.8, 8
    psi = np.full(d, d ** -0.5)
    rho0 = cpx.from_complex(np.outer(psi, psi), F32)
    w = jnp.asarray(np.cos(np.linspace(0, 7, d)), F32)

    def loss(cc):
        rho = evolve_lindblad_structured(ham, env, cc, rho0, noise, 0.0, T,
                                         horizon=T, n_steps=n_steps)
        return expectation_rho(w, rho)

    opt = optax.adam(5e-2)
    cc = coeff.astype(F32)
    state = opt.init(cc)
    losses = []
    for _ in range(4):
        val, g = jax.value_and_grad(loss)(cc)
        losses.append(float(val))
        updates, state = opt.update(g, state, cc)
        cc = optax.apply_updates(cc, updates)
    assert losses[-1] < losses[0], losses


def _mcwf_score_loss(ham, env, psi0, noise, w, T, n_steps, key, n_traj):
    from diffquantum_tpu.dynamics.lindblad import (evolve_mcwf_structured,
                                                   score_surrogate)

    def loss(cc):
        psis, logps = evolve_mcwf_structured(
            ham, env, cc, psi0, noise, 0.0, T, horizon=T, n_steps=n_steps,
            key=key, n_traj=n_traj, return_logp=True)
        vals = jnp.sum(cpx.abs2(psis) * w, axis=-1)
        return score_surrogate(vals, logps)

    return loss


@pytest.mark.slow
def test_mcwf_score_zero_noise_limit():
    """gamma -> 0: the hybrid pathwise+score gradient reduces to the
    closed-system product-engine gradient (deterministic, tight)."""
    from diffquantum_tpu.dynamics.hamiltonian import TermStructure
    from diffquantum_tpu.dynamics.lindblad import StructuredNoise
    from diffquantum_tpu.dynamics.product import evolve_product

    structure = (TermStructure(kind="1q", qubit=0, local=linalg.X),)
    ham = ControlledHamiltonian.create(
        np.zeros((2, 2)), [linalg.X], dtype=F64, structure=structure,
        h0_structure=TermStructure(kind="diag", diag=np.zeros(2)))
    env = SimpleEnvelope(basis="bspline", n_basis=4, omegas=(np.pi,))
    coeff = jnp.asarray(np.random.default_rng(1).standard_normal((1, 4)))
    psi0 = cpx.from_complex(np.array([1.0, 0.0]), F64)
    w = jnp.asarray([0.7, -0.4], F64)
    T, n_steps = 1.0, 100
    noise = StructuredNoise(1, t1=[(0, 1e-14)])

    loss = _mcwf_score_loss(ham, env, psi0, noise, w, T, n_steps,
                            jax.random.PRNGKey(0), n_traj=4)

    def loss_closed(cc):
        psi = evolve_product(ham, env, cc, psi0, 0.0, T, horizon=T,
                             n_steps=n_steps)
        return jnp.sum(cpx.abs2(psi) * w)

    v, g = jax.value_and_grad(loss)(coeff)
    v_c, g_c = jax.value_and_grad(loss_closed)(coeff)
    np.testing.assert_allclose(float(v), float(v_c), atol=1e-8)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_c), atol=1e-7)


def test_mcwf_score_gradient_vs_dense_lindblad():
    """Unbiasedness of the score-function MCWF gradient: on a driven
    2-qubit system with T1 + dephasing the trajectory-ensemble gradient
    agrees with the dense master-equation gradient (statistical
    tolerance: direction tight, magnitude loose)."""
    ham, env, coeff, noise = _structured_noisy_problem(n=2, seed=3)
    dham = _dense_twin(ham)
    T, n_steps = 1.0, 150
    plus = np.full(4, 0.5)
    psi0 = cpx.from_complex(plus, F64)
    rho0 = _rho(plus)
    w = jnp.asarray(np.linspace(-1, 1, 4), F64)
    c = CollapseSet.create(noise.dense_collapse_ops(), dtype=F64)

    loss = _mcwf_score_loss(ham, env, psi0, noise, w, T, n_steps,
                            jax.random.PRNGKey(11), n_traj=6000)

    def loss_d(cc):
        rho = evolve_lindblad(dham, env, cc, rho0, c, 0.0, T, horizon=T,
                              n_steps=400)
        return expectation_rho(w, rho)

    v, g_t = jax.value_and_grad(loss)(coeff)
    g_t = np.asarray(g_t)
    v_d, g_d = jax.value_and_grad(loss_d)(coeff)
    g_d = np.asarray(g_d)
    # the ensemble VALUE itself tracks tr(M rho) (O(dt) unraveling bias
    # + O(1/sqrt(n_traj)) noise)
    np.testing.assert_allclose(float(v), float(v_d), atol=0.04)
    denom = np.linalg.norm(g_d)
    assert np.linalg.norm(g_t - g_d) / denom < 0.35, (g_t, g_d)
    cosine = float(np.sum(g_t * g_d)) / (np.linalg.norm(g_t) * denom)
    assert cosine > 0.9, cosine


def test_mcwf_score_pathwise_only_is_biased():
    """Negative control: WITHOUT the score term (plain mean over the same
    trajectories) the gradient misses the jump-measure dependence — on a
    T1 problem it disagrees with the master-equation gradient by more
    than the full estimator does. Guards against the score term being
    silently dropped."""
    from diffquantum_tpu.dynamics.lindblad import evolve_mcwf_structured

    ham, env, coeff, noise = _structured_noisy_problem(n=2, seed=3)
    dham = _dense_twin(ham)
    T, n_steps = 1.0, 150
    plus = np.full(4, 0.5)
    psi0 = cpx.from_complex(plus, F64)
    rho0 = _rho(plus)
    w = jnp.asarray(np.linspace(-1, 1, 4), F64)
    c = CollapseSet.create(noise.dense_collapse_ops(), dtype=F64)
    key = jax.random.PRNGKey(11)

    loss_full = _mcwf_score_loss(ham, env, psi0, noise, w, T, n_steps,
                                 key, n_traj=6000)

    def loss_pathwise(cc):
        psis = evolve_mcwf_structured(
            ham, env, cc, psi0, noise, 0.0, T, horizon=T, n_steps=n_steps,
            key=key, n_traj=6000)
        return jnp.mean(jnp.sum(cpx.abs2(psis) * w, axis=-1))

    def loss_d(cc):
        rho = evolve_lindblad(dham, env, cc, rho0, c, 0.0, T, horizon=T,
                              n_steps=400)
        return expectation_rho(w, rho)

    g_full = np.asarray(jax.grad(loss_full)(coeff))
    g_path = np.asarray(jax.grad(loss_pathwise)(coeff))
    g_d = np.asarray(jax.grad(loss_d)(coeff))
    err_full = np.linalg.norm(g_full - g_d)
    err_path = np.linalg.norm(g_path - g_d)
    assert err_full < err_path, (err_full, err_path)


@pytest.mark.slow
def test_noise_aware_training_mcwf_14q():
    """T1-aware pulse optimization PAST the density-matrix d^2 wall: Adam
    through the score-function MCWF estimator at 14 qubits (no [d, d]
    operator anywhere; rho would be 2^28 entries). Fixed key per step =
    common random numbers, so the surrogate is a deterministic function
    Adam can descend."""
    import optax
    from diffquantum_tpu.dynamics.lindblad import StructuredNoise
    from diffquantum_tpu.models import maxcut

    F32 = jnp.float32
    n = 14
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4,
                               dense=False, dtype=F32)
    rng = np.random.default_rng(0)
    cc = jnp.asarray(rng.standard_normal(prob.envelope.coeff_shape) * 0.3,
                     F32)
    noise = StructuredNoise(n, t1=[(q, 0.15) for q in range(n)])
    w = prob.measurement.diag.astype(F32)

    loss = _mcwf_score_loss(prob.ham, prob.envelope, prob.psi0, noise, w,
                            float(prob.T), 8, jax.random.PRNGKey(3),
                            n_traj=4)
    opt = optax.adam(8e-2)
    state = opt.init(cc)
    losses = []
    for _ in range(4):
        val, g = jax.value_and_grad(loss)(cc)
        losses.append(float(val))
        assert np.isfinite(losses[-1])
        updates, state = opt.update(g, state, cc)
        cc = optax.apply_updates(cc, updates)
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_structured_mcwf_fused_backend_matches_xla():
    """backend='fused' (lockstep trajectories through one batched Pallas
    rotation block per step) must reproduce the XLA path draw for draw:
    same per-trajectory key chain => same jump decisions => same states
    and log-likelihoods to fp tolerance; the hybrid score gradient stays
    finite and matches."""
    from diffquantum_tpu.dynamics.lindblad import (StructuredNoise,
                                                   evolve_mcwf_structured,
                                                   score_surrogate)
    from diffquantum_tpu.models import maxcut

    n = 12
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4,
                               dense=False)
    rng = np.random.default_rng(3)
    coeff = jnp.asarray(rng.standard_normal(
        prob.envelope.coeff_shape).astype(np.float32) * 0.3)
    noise = StructuredNoise(n, t1=[(q, 0.3) for q in range(0, n, 2)],
                            dephasing=[(1, 0.2), (7, 0.4)])
    key = jax.random.PRNGKey(9)
    kw = dict(T0=0.0, T=float(prob.T), horizon=float(prob.T), n_steps=12,
              key=key, n_traj=6, return_logp=True)

    ps_x, lp_x = evolve_mcwf_structured(prob.ham, prob.envelope, coeff,
                                        prob.psi0, noise, backend="xla",
                                        **kw)
    ps_f, lp_f = evolve_mcwf_structured(prob.ham, prob.envelope, coeff,
                                        prob.psi0, noise, backend="fused",
                                        **kw)
    np.testing.assert_allclose(np.asarray(ps_f.re), np.asarray(ps_x.re),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ps_f.im), np.asarray(ps_x.im),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lp_f), np.asarray(lp_x),
                               rtol=1e-4, atol=1e-5)

    w = prob.measurement.diag

    def loss(cc, backend):
        psis, logps = evolve_mcwf_structured(
            prob.ham, prob.envelope, cc, prob.psi0, noise,
            backend=backend, **kw)
        vals = jnp.sum(cpx.abs2(psis) * w, axis=-1)
        return score_surrogate(vals, logps)

    vf, gf = jax.value_and_grad(lambda c: loss(c, "fused"))(coeff)
    vx, gx = jax.value_and_grad(lambda c: loss(c, "xla"))(coeff)
    assert np.isfinite(float(vf))
    np.testing.assert_allclose(float(vf), float(vx), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=5e-3, atol=1e-5)
