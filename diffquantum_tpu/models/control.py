"""Quantum optimal-control problem family: state transfer + gate synthesis.

The reference README lists the control demos as TODO
(`/root/reference/README.md:28-31`); its ``train_fidelity``
(`/root/reference/sim_plain.py:414-475`) is the engine. This module builds
the standard tasks:

- :func:`state_transfer`: drive |psi0> to |target> under X/Y controls with a
  Z drift (detuning) — the single/two-qubit transfer benchmark.
- :func:`gate_synthesis_pairs`: synthesize a target unitary G by maximizing
  transfer fidelity over a spanning set of input states (|i> → G|i>), which
  is exactly the batch-of-pairs interface of ``train_fidelity``.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..dynamics.hamiltonian import ControlledHamiltonian
from ..ops import cpx, linalg
from ..ops.cpx import CP
from ..pulses.envelope import SimpleEnvelope


@dataclasses.dataclass
class ControlProblem:
    ham: ControlledHamiltonian
    envelope: SimpleEnvelope
    initial_states: CP   # [n_pairs, d]
    target_states: CP    # [n_pairs, d]
    T: float


def single_qubit_controls(detuning: float = 0.5, omega: float = np.pi,
                          dtype=jnp.float32):
    """H0 = detuning * Z / 2, controls {X, Y}."""
    H0 = 0.5 * detuning * linalg.Z
    Hs = [linalg.X, linalg.Y]
    ham = ControlledHamiltonian.create(H0, Hs, dtype=dtype)
    return ham, (omega, omega)


def two_qubit_controls(coupling: float = 0.0, omega: float = np.pi,
                       dtype=jnp.float32):
    """Controls {X0, X1, Y0, Y1, ZZ}; optional fixed ZZ drift."""
    H0 = coupling * linalg.pauli_string("ZZ")
    Hs = [linalg.pauli_string("XI"), linalg.pauli_string("IX"),
          linalg.pauli_string("YI"), linalg.pauli_string("IY"),
          linalg.pauli_string("ZZ")]
    ham = ControlledHamiltonian.create(H0, Hs, dtype=dtype)
    return ham, (omega,) * len(Hs)


def state_transfer(n_qubits: int = 1, T: float = 2.0, n_basis: int = 6,
                   basis: str = "bspline", dtype=jnp.float32,
                   source: int = 0, target: int = None) -> ControlProblem:
    """|source> → |target> transfer (default |0...0> → |1...1>)."""
    d = 2**n_qubits
    if target is None:
        target = d - 1
    if n_qubits == 1:
        ham, omegas = single_qubit_controls(dtype=dtype)
    elif n_qubits == 2:
        ham, omegas = two_qubit_controls(dtype=dtype)
    else:
        raise ValueError("state_transfer supports 1 or 2 qubits; build "
                         "custom ControlProblem for larger systems")
    env = SimpleEnvelope(basis=basis, n_basis=n_basis, omegas=omegas)
    psi0 = cpx.from_complex(linalg.basis_state(source, d)[None, :], dtype=dtype)
    psi1 = cpx.from_complex(linalg.basis_state(target, d)[None, :], dtype=dtype)
    return ControlProblem(ham=ham, envelope=env, initial_states=psi0,
                          target_states=psi1, T=float(T))


def bell_state_preparation(T: float = 2.0, n_basis: int = 6,
                           basis: str = "bspline",
                           dtype=jnp.float32) -> ControlProblem:
    """|00> → (|00> + |11>)/sqrt(2)."""
    ham, omegas = two_qubit_controls(dtype=dtype)
    env = SimpleEnvelope(basis=basis, n_basis=n_basis, omegas=omegas)
    psi0 = cpx.from_complex(linalg.basis_state(0, 4)[None, :], dtype=dtype)
    bell = (linalg.basis_state(0, 4) + linalg.basis_state(3, 4)) / np.sqrt(2)
    psi1 = cpx.from_complex(bell[None, :], dtype=dtype)
    return ControlProblem(ham=ham, envelope=env, initial_states=psi0,
                          target_states=psi1, T=float(T))


def gate_synthesis_pairs(gate: np.ndarray, ham: ControlledHamiltonian,
                         envelope: SimpleEnvelope, T: float,
                         dtype=jnp.float32) -> ControlProblem:
    """Target-unitary synthesis as a batch of basis-state transfer pairs
    (|i> → G|i> for every computational basis state i)."""
    d = gate.shape[0]
    eye = np.eye(d, dtype=np.complex128)
    targets = (np.asarray(gate) @ eye).T  # row i = G|i>
    return ControlProblem(
        ham=ham, envelope=envelope,
        initial_states=cpx.from_complex(eye, dtype=dtype),
        target_states=cpx.from_complex(targets, dtype=dtype), T=float(T))


def hadamard_synthesis(T: float = 2.0, n_basis: int = 6,
                       basis: str = "bspline",
                       dtype=jnp.float32) -> ControlProblem:
    ham, omegas = single_qubit_controls(detuning=0.0, dtype=dtype)
    env = SimpleEnvelope(basis=basis, n_basis=n_basis, omegas=omegas)
    h = np.array([[1, 1], [1, -1]]) / np.sqrt(2)
    return gate_synthesis_pairs(h, ham, env, T, dtype=dtype)
