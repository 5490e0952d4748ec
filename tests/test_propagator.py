"""Propagator (CP representation) vs (a) an independent scipy
re-implementation of the reference trotter semantics and (b) closed-form
Rabi physics."""
import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from diffquantum_tpu.dynamics.hamiltonian import ControlledHamiltonian
from diffquantum_tpu.dynamics.propagator import evolve, reference_n_steps, trotter
from diffquantum_tpu.ops import cpx, linalg

F64 = jnp.float64
from diffquantum_tpu.pulses.envelope import SimpleEnvelope


def reference_trotter(H0, Hs, u_fns, psi0, T0, T, per_step=10):
    """Independent numpy re-implementation of the reference semantics
    (`sim_plain.py:119-153` / `diffqc.cc:173-205`): left-endpoint grid,
    summed dH, dense expm per step."""
    n_steps = int(per_step * (abs(T - T0) + 1))
    dt = (T - T0) / n_steps
    t = T0
    psi = np.asarray(psi0, dtype=np.complex128).copy()
    for _ in range(n_steps):
        H = np.asarray(H0, dtype=np.complex128).copy()
        for h, u in zip(Hs, u_fns):
            H = H + u(t) * np.asarray(h)
        psi = scipy.linalg.expm(-1j * dt * H) @ psi
        t += dt
    return psi


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def make_problem(seed=0, n_qubits=3, n_controls=4, n_basis=5, T=2.0):
    rng = np.random.default_rng(seed)
    H0 = linalg.op_on_qubits(linalg.Z, [0], n_qubits) * 0.3
    Hs, omegas = [], []
    specs = ["XII", "IXI", "ZZI", "IZZ"][:n_controls]
    for s in specs:
        Hs.append(linalg.pauli_string(s))
        omegas.append(np.pi)
    coeff = rng.standard_normal((n_controls, n_basis)) * 0.5
    psi0 = linalg.uniform_superposition(n_qubits)
    return H0, Hs, omegas, coeff, psi0, T


def test_evolve_matches_reference_semantics_legendre():
    from scipy.special import legendre as scipy_legendre
    H0, Hs, omegas, coeff, psi0, T = make_problem()
    n_basis = coeff.shape[1]

    # reference-style envelope closures (independent impl)
    legs = [scipy_legendre(j) for j in range(n_basis)]

    def u_fn(i):
        def f(t):
            a = sum(coeff[i, j] * legs[j](2 * t / T - 1) for j in range(n_basis))
            return (sigmoid(a) * 2 - 1) * omegas[i]
        return f

    want = reference_trotter(H0, Hs, [u_fn(i) for i in range(len(Hs))],
                             psi0, 0.0, T, per_step=10)

    ham = ControlledHamiltonian.create(H0, Hs, dtype=F64)
    env = SimpleEnvelope(basis="legendre", n_basis=n_basis, omegas=tuple(omegas))
    got = cpx.to_complex(trotter(ham, env, jnp.asarray(coeff),
                                 cpx.from_complex(psi0, F64), 0.0, T,
                                 per_step=10))
    fidelity = abs(np.vdot(want, got)) ** 2
    assert fidelity > 1 - 1e-9, fidelity
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_expm_and_apply_backends_agree():
    H0, Hs, omegas, coeff, psi0, T = make_problem(seed=1)
    ham = ControlledHamiltonian.create(H0, Hs, dtype=F64)
    env = SimpleEnvelope(basis="bspline", n_basis=5, omegas=tuple(omegas))
    n_steps = reference_n_steps(10, 0.0, T)
    cp0 = cpx.from_complex(psi0, F64)
    a = evolve(ham, env, jnp.asarray(coeff), cp0, 0.0, T,
               horizon=T, n_steps=n_steps, backend="expm")
    b = evolve(ham, env, jnp.asarray(coeff), cp0, 0.0, T,
               horizon=T, n_steps=n_steps, backend="apply")
    np.testing.assert_allclose(cpx.to_complex(a), cpx.to_complex(b), atol=1e-9)


def test_rabi_closed_form():
    # Constant X drive H = u X: U = exp(-i u T X) → |<1|psi(T)>|^2 =
    # sin^2(u T). Constant envelope via poly basis with only c_0 active →
    # u = (2 sigmoid(c0) - 1) * omega.
    c0 = 0.7
    omega = np.pi
    u = (2 * sigmoid(c0) - 1) * omega
    T = 1.0
    ham = ControlledHamiltonian.create(np.zeros((2, 2)), [linalg.X], dtype=F64)
    env = SimpleEnvelope(basis="poly", n_basis=1, omegas=(omega,))
    psi0 = cpx.from_complex(linalg.basis_state(0, 2), F64)
    psiT = cpx.to_complex(trotter(ham, env, jnp.asarray([[c0]]), psi0, 0.0, T,
                                  per_step=200))
    p1 = abs(psiT[1]) ** 2
    assert abs(p1 - np.sin(u * T) ** 2) < 1e-6


def test_norm_preserved_and_batched():
    H0, Hs, omegas, coeff, psi0, T = make_problem(seed=2)
    ham = ControlledHamiltonian.create(H0, Hs, dtype=F64)
    env = SimpleEnvelope(basis="fourier", n_basis=6, omegas=tuple(omegas))
    coeff = jnp.asarray(np.random.default_rng(3).standard_normal((4, 6)))
    batch = cpx.from_complex(np.stack([psi0] * 3), F64)
    out = trotter(ham, env, coeff, batch, 0.0, T, per_step=10)
    assert out.shape == batch.shape
    norms = np.linalg.norm(cpx.to_complex(out), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-9)


def test_traced_endpoint_segments_compose():
    # evolve(0→s) then evolve(s→T) with traced s ≈ evolve(0→T) in the
    # piecewise-constant-limit sense: check convergence as per_step grows.
    H0, Hs, omegas, coeff, psi0, T = make_problem(seed=4)
    ham = ControlledHamiltonian.create(H0, Hs, dtype=F64)
    env = SimpleEnvelope(basis="legendre", n_basis=5, omegas=tuple(omegas))
    coeff = jnp.asarray(coeff)
    cp0 = cpx.from_complex(psi0, F64)
    n = 400

    @jax.jit
    def split_evolve(s):
        mid = evolve(ham, env, coeff, cp0, 0.0, s, horizon=T, n_steps=n,
                     dt_bound=T / n)
        return evolve(ham, env, coeff, mid, s, T, horizon=T, n_steps=n,
                      dt_bound=T / n)

    full = evolve(ham, env, coeff, cp0, 0.0, T, horizon=T, n_steps=2 * n)
    got = split_evolve(jnp.asarray(0.773))
    fid = abs(np.vdot(cpx.to_complex(full), cpx.to_complex(got))) ** 2
    assert fid > 1 - 1e-6, fid
