"""Dense linear-algebra helpers for small quantum operators.

TPU-native rebuild of the reference's static helpers
(`/root/reference/sim_plain.py:477-505`): ``multi_kron`` / ``multi_dot`` /
``find_state``, plus Pauli constructors and operator utilities the reference
builds inline in its demo (`/root/reference/demo_maxcut.py:19-28`).

Everything here is plain ``jax.numpy`` — these run once at problem-setup time
(operator construction), not in the hot propagation path.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Pauli matrices (numpy: used at problem-construction time, traced code gets
# jnp views on demand).
# ---------------------------------------------------------------------------

I2 = np.eye(2, dtype=np.complex128)
X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=np.complex128)
Y = np.array([[0.0, -1.0j], [1.0j, 0.0]], dtype=np.complex128)
Z = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=np.complex128)

PAULIS = {"I": I2, "X": X, "Y": Y, "Z": Z}


def multi_kron(*ops) -> np.ndarray:
    """Kronecker product of a sequence of operators.

    Mirrors ``SimulatorPlain.multi_kron`` (`sim_plain.py:477-482`).
    """
    ret = np.array([[1.0 + 0.0j]])
    for q in ops:
        ret = np.kron(ret, np.asarray(q))
    return ret


def multi_dot(*ops):
    """Chained matrix product (`sim_plain.py:484-491`)."""
    ret = None
    for q in ops:
        ret = q if ret is None else ret @ q
    return ret


def pauli_string(spec: str) -> np.ndarray:
    """Dense operator for a Pauli string such as ``"ZIZI"`` or ``"XXYZ"``."""
    return multi_kron(*[PAULIS[c] for c in spec])


def op_on_qubits(op: np.ndarray, qubits: Sequence[int], n_qubits: int,
                 op_single: np.ndarray | None = None) -> np.ndarray:
    """Place single-qubit operator ``op`` on each qubit in ``qubits``
    (tensor product of `op` on those sites, identity elsewhere).

    Replaces the demo's inline ``multi_kron(*[I if j not in e else Z ...])``
    pattern (`demo_maxcut.py:72,77`).
    """
    single = op if op_single is None else op_single
    return multi_kron(*[single if j in qubits else I2 for j in range(n_qubits)])


def find_state(final_state) -> tuple[int, np.ndarray]:
    """Most-probable computational basis state and the Born distribution.

    Mirrors ``SimulatorPlain.find_state`` (`sim_plain.py:494-505`).
    Accepts a 1-D state vector (numpy/jax complex, or a CP real pair).
    """
    if hasattr(final_state, "re"):  # CP pair — fetch real arrays only
        prob = (np.asarray(final_state.re).reshape(-1) ** 2
                + np.asarray(final_state.im).reshape(-1) ** 2)
    else:
        prob = np.abs(np.asarray(final_state).reshape(-1)) ** 2
    return int(np.argmax(prob)), prob


def uniform_superposition(n_qubits: int) -> np.ndarray:
    """|+>^n as a dense vector (`demo_maxcut.py:12-17`)."""
    d = 2**n_qubits
    return np.full((d,), 1.0 / np.sqrt(d), dtype=np.complex128)


def basis_state(index: int, dim: int) -> np.ndarray:
    psi = np.zeros((dim,), dtype=np.complex128)
    psi[index] = 1.0
    return psi


def dagger(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.conjugate(jnp.swapaxes(a, -1, -2))


def is_hermitian(a: np.ndarray, atol: float = 1e-9) -> bool:
    return bool(np.allclose(a, a.conj().T, atol=atol))


@functools.lru_cache(maxsize=None)
def _zz_diag_cache(n_qubits: int, i: int, j: int) -> np.ndarray:
    bits = np.arange(2**n_qubits)
    bi = (bits >> (n_qubits - 1 - i)) & 1
    bj = (bits >> (n_qubits - 1 - j)) & 1
    return np.where(bi == bj, 1.0, -1.0)


def zz_diagonal(n_qubits: int, i: int, j: int) -> np.ndarray:
    """Diagonal of Z_i Z_j as a length-2^n real vector (qubit 0 = MSB,
    matching the kron ordering of :func:`op_on_qubits`)."""
    return _zz_diag_cache(n_qubits, i, j)


def z_diagonal(n_qubits: int, i: int) -> np.ndarray:
    bits = np.arange(2**n_qubits)
    bi = (bits >> (n_qubits - 1 - i)) & 1
    return np.where(bi == 0, 1.0, -1.0)
