"""BASELINE.md acceptance: state fidelity vs the CPU reference semantics
>= 1 - 1e-6, including over long (1000-step) propagator chains."""
import jax.numpy as jnp
import numpy as np
import scipy.linalg
from scipy.special import legendre as scipy_legendre

from diffquantum_tpu.dynamics.hamiltonian import ControlledHamiltonian
from diffquantum_tpu.dynamics.propagator import evolve
from diffquantum_tpu.ops import cpx, linalg
from diffquantum_tpu.pulses.envelope import SimpleEnvelope

F64 = jnp.float64


def test_thousand_step_chain_fidelity_vs_scipy():
    # 4 qubits, 1000 sequential steps: multiplicative error accumulation
    # must stay below 1e-6 infidelity (float64 path).
    n_qubits, n_basis, T = 4, 5, 2.0
    n_steps = 1000
    rng = np.random.default_rng(0)
    H0 = 0.3 * linalg.pauli_string("ZIII")
    Hs = [linalg.pauli_string("XIII"), linalg.pauli_string("IXII"),
          linalg.pauli_string("ZZII"), linalg.pauli_string("IIZZ")]
    omegas = [np.pi] * 4
    coeff = rng.standard_normal((4, n_basis)) * 0.5
    psi0 = linalg.uniform_superposition(n_qubits)

    legs = [scipy_legendre(j) for j in range(n_basis)]

    def u(i, t):
        a = sum(coeff[i, j] * legs[j](2 * t / T - 1) for j in range(n_basis))
        return (2.0 / (1.0 + np.exp(-a)) - 1.0) * omegas[i]

    # scipy reference chain
    dt = T / n_steps
    t = 0.0
    psi_ref = psi0.copy()
    for _ in range(n_steps):
        H = np.asarray(H0, dtype=np.complex128).copy()
        for i, Hk in enumerate(Hs):
            H += u(i, t) * np.asarray(Hk)
        psi_ref = scipy.linalg.expm(-1j * dt * H) @ psi_ref
        t += dt

    ham = ControlledHamiltonian.create(H0, Hs, dtype=F64)
    env = SimpleEnvelope(basis="legendre", n_basis=n_basis,
                         omegas=tuple(omegas))
    for backend in ("expm", "apply"):
        got = cpx.to_complex(evolve(ham, env, jnp.asarray(coeff),
                                    cpx.from_complex(psi0, F64), 0.0, T,
                                    horizon=T, n_steps=n_steps,
                                    backend=backend, tol=1e-12))
        fid = abs(np.vdot(psi_ref, got)) ** 2
        assert fid > 1 - 1e-6, (backend, fid)
