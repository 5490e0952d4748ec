"""Carrier-modulated channel pulse model (C3): JAX array program vs the
native C++ engine and an independent numpy oracle."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import expit

from diffquantum_tpu.dynamics.hamiltonian import ControlledHamiltonian
from diffquantum_tpu.dynamics.propagator import trotter
from diffquantum_tpu.native import bindings
from diffquantum_tpu.ops import cpx, linalg
from diffquantum_tpu.pulses.envelope import ChannelEnvelope

F64 = jnp.float64


def oracle_amplitude(rows, h, t, vv, duration, func_type, n_basis):
    """Independent pointwise implementation of `diffqc.cc:95-135`."""
    from scipy.special import legendre as scipy_legendre

    def phi(j):
        if func_type == 0:
            return scipy_legendre(j)(2 * t / duration - 1)
        tau = 1.0 / (n_basis - 2)
        c = tau * (j - 1.5)
        l, r = c - 1.5 * tau, c + 1.5 * tau
        tn = t / duration
        return 0.0 if (tn <= l or tn >= r) else \
            (tn - l) * (tn - r) / (-(1.5 * tau) ** 2)

    ans = 0.0
    for (ctrl, omega, w, idx) in rows:
        if ctrl != h:
            continue
        A = sum(vv[0, idx, j] * phi(j) for j in range(n_basis))
        B = sum(vv[1, idx, j] * phi(j) for j in range(n_basis))
        N = np.hypot(A, B)
        if N < 1e-6:
            continue
        ans += omega * (2 * expit(N) - 1) / N * (
            np.cos(w * t) * A + np.sin(w * t) * B)
    return ans


def make_model(func_type=0, seed=0):
    rng = np.random.default_rng(seed)
    # reference-style nested channel table: rows [_, omega, w, idx]
    nested = [
        [[0.0, np.pi, 5.0, 0], [0.0, 0.5 * np.pi, 9.0, 1]],  # control 0
        [[0.0, np.pi, 4.0, 2]],                               # control 1
    ]
    n_basis = 5
    env = ChannelEnvelope.from_rows(nested, n_basis, func_type=func_type)
    vv = rng.standard_normal((2, env.n_idx, n_basis)) * 0.7
    rows = [(c.control, c.omega, c.w, c.idx) for c in env.channels]
    return env, vv, rows, 2.0, n_basis


@pytest.mark.parametrize("func_type", [0, 1])
def test_channel_amplitudes_match_oracle(func_type):
    env, vv, rows, T, n_basis = make_model(func_type)
    ts = np.linspace(0.0, T, 17, endpoint=False)
    got = np.asarray(env.amplitudes(jnp.asarray(vv), jnp.asarray(ts), T))
    want = np.array([[oracle_amplitude(rows, h, t, vv, T, func_type, n_basis)
                      for t in ts] for h in range(env.n_controls)])
    np.testing.assert_allclose(got, want, atol=1e-9)


@pytest.mark.skipif(not bindings.available(), reason="no native toolchain")
def test_channel_evolution_jax_vs_native():
    env, vv, rows, T, n_basis = make_model(func_type=0, seed=3)
    H0 = 0.2 * linalg.pauli_string("ZI")
    Hs = [linalg.pauli_string("XI"), linalg.pauli_string("IX")]
    psi0 = linalg.uniform_superposition(2)

    ham = ControlledHamiltonian.create(H0, Hs, dtype=F64)
    got = cpx.to_complex(trotter(ham, env, jnp.asarray(vv),
                                 cpx.from_complex(psi0, F64), 0.0, T,
                                 per_step=10, backend="expm"))

    sys = bindings.NativeSystem()
    sys.set_system(H0, Hs, rows, T, 0)
    want = sys.trotter(psi0, 0.0, T, 10, vv)
    fid = abs(np.vdot(want, got)) ** 2
    assert fid > 1 - 1e-9, fid
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_channel_mc_gradient_matches_adjoint_direction():
    """MC estimator with the carrier/channel pulse model: averaged estimate
    must align with the exact adjoint gradient (jacobian-based chain)."""
    import jax

    from diffquantum_tpu.gradients.mc import mc_energy_grad
    from diffquantum_tpu.measure import Measurement

    env, vv, rows, T, n_basis = make_model(func_type=1, seed=7)
    H0 = np.zeros((4, 4))
    Hs = [linalg.pauli_string("XI"), linalg.pauli_string("IX")]
    ham = ControlledHamiltonian.create(H0, Hs, dtype=F64)
    psi0 = cpx.from_complex(linalg.basis_state(0, 4), F64)
    m_np = linalg.pauli_string("ZZ")
    meas = Measurement.create(m_np, dtype=F64)
    coeff = jnp.asarray(vv)
    # fast carriers (w up to 9 rad) need a fine grid: the MC estimator
    # approximates the continuum derivative while the adjoint differentiates
    # the discretized loss — they agree in the dt→0 limit (cos 0.91 at 30
    # steps → 0.99 at 120 steps).
    n_steps = 120

    from diffquantum_tpu.dynamics.propagator import evolve
    from diffquantum_tpu.measure import exact_expectation

    def loss(v):
        psi = evolve(ham, env, v, psi0, 0.0, T, horizon=T, n_steps=n_steps)
        return exact_expectation(meas.matrix, psi)

    g_adj = np.asarray(jax.grad(loss)(coeff))

    n_mc = 400
    keys = jax.random.split(jax.random.PRNGKey(3), n_mc)
    grads = jax.jit(jax.vmap(lambda k: mc_energy_grad(
        ham, env, meas, coeff, psi0, T, k, n_steps)))(keys)
    g_mc = np.asarray(grads.mean(axis=0)) * T

    a, b = g_mc.ravel(), g_adj.ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.95, cos


def test_channel_envelope_trainable():
    # coefficients are differentiable through the channel model
    import jax
    env, vv, rows, T, n_basis = make_model(func_type=1, seed=4)
    H0 = np.zeros((4, 4))
    Hs = [linalg.pauli_string("XI"), linalg.pauli_string("IX")]
    ham = ControlledHamiltonian.create(H0, Hs, dtype=F64)
    # |00>: X drives rotate populations, so <ZZ> depends on the pulse
    # (|++> would be an X eigenstate — zero gradient by symmetry).
    psi0 = cpx.from_complex(linalg.basis_state(0, 4), F64)
    m = cpx.from_complex(linalg.pauli_string("ZZ"), F64)

    def loss(v):
        psi = trotter(ham, env, v, psi0, 0.0, T, per_step=10)
        from diffquantum_tpu.measure import exact_expectation
        return exact_expectation(m, psi)

    g = jax.grad(loss)(jnp.asarray(vv))
    assert g.shape == vv.shape
    assert np.any(np.abs(np.asarray(g)) > 1e-8)
    # FD cross-check on one coordinate
    eps = 1e-5
    vp, vm = vv.copy(), vv.copy()
    vp[0, 0, 1] += eps
    vm[0, 0, 1] -= eps
    fd = (float(loss(jnp.asarray(vp))) - float(loss(jnp.asarray(vm)))) / (2 * eps)
    assert abs(fd - float(np.asarray(g)[0, 0, 1])) < 1e-5
