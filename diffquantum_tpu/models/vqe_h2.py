"""VQE for the H2 molecule ground state with analog pulses.

The reference README lists "VQE ground state energy of H2" as a demo TODO
(`/root/reference/README.md:25-27`); this module completes it. The molecular
Hamiltonian is the standard 2-qubit reduced H2 operator (STO-3G, bond length
0.7414 Å, after symmetry reduction — O'Malley et al., PRX 6 031007 (2016)):

    H = g0 I + g1 Z0 + g2 Z1 + g3 Z0 Z1 + g4 Y0 Y1 + g5 X0 X1

Controls: single-qubit X drives plus ZZ and XX couplers — a hardware-like
analog drive set; the pulse coefficients are trained with any of the three
gradient engines via :func:`diffquantum_tpu.train.energy.train_energy`.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..dynamics.hamiltonian import ControlledHamiltonian
from ..measure import Measurement
from ..ops import cpx, linalg
from ..ops.cpx import CP
from ..pulses.envelope import SimpleEnvelope

# g coefficients (Hartree) for R = 0.7414 Å (O'Malley et al. 2016, Table I).
H2_COEFFS = {
    "II": -0.4804,
    "ZI": +0.3435,
    "IZ": -0.4347,
    "ZZ": +0.5716,
    "YY": +0.0910,
    "XX": +0.0910,
}


def h2_hamiltonian() -> tuple[np.ndarray, list[tuple[np.ndarray, float]]]:
    """(dense 4x4 molecular Hamiltonian, weighted Pauli term list)."""
    terms = [(linalg.pauli_string(p), g) for p, g in H2_COEFFS.items()]
    m = sum(g * p for p, g in terms)
    return m, terms


@dataclasses.dataclass
class VQEProblem:
    ham: ControlledHamiltonian
    envelope: SimpleEnvelope
    measurement: Measurement
    psi0: CP
    T: float
    exact_ground_energy: float


def build_h2(n_basis: int = 6, basis: str = "bspline", T: float = 2.0,
             omega: float = np.pi, dtype=jnp.float32,
             sampling: bool = False, noisy: bool = False) -> VQEProblem:
    m, terms = h2_hamiltonian()
    exact = float(np.linalg.eigvalsh(m)[0])

    # analog drive set: X/Z per qubit + XX/YY/ZZ entanglers. The two-axis
    # single-qubit control is essential: with only X drives the optimizer
    # parks at the |10> Hartree-Fock state (-1.8302 Ha) and cannot build the
    # phase-correct |01> admixture of the true ground state (-1.8512 Ha).
    Hs = [linalg.pauli_string("XI"), linalg.pauli_string("IX"),
          linalg.pauli_string("XX"), linalg.pauli_string("YY"),
          linalg.pauli_string("ZZ"), linalg.pauli_string("ZI"),
          linalg.pauli_string("IZ")]
    omegas = (omega,) * len(Hs)

    ham = ControlledHamiltonian.create(np.zeros((4, 4)), Hs, dtype=dtype)
    env = SimpleEnvelope(basis=basis, n_basis=n_basis, omegas=omegas)
    meas = Measurement.create(m, terms=terms, dtype=dtype,
                              sampling=sampling, noisy=noisy)
    # Hartree-Fock reference state |10> (the lower of the two single-
    # occupation states for these coefficients) is the standard VQE start.
    psi0 = cpx.from_complex(linalg.basis_state(2, 4), dtype=dtype)
    return VQEProblem(ham=ham, envelope=env, measurement=meas, psi0=psi0,
                      T=float(T), exact_ground_energy=exact)
