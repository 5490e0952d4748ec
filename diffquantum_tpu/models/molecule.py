"""Ab-initio molecular VQE: H2 at ANY bond length (STO-3G), from integrals
to pulse-level training.

Extends :mod:`.vqe_h2` (one hardcoded bond length from O'Malley et al.,
PRX 6 031007) with the full pipeline, self-contained in numpy:

  1. STO-3G s-type Gaussian integrals (overlap / kinetic / nuclear
     attraction / ERI) in closed form via the Boys function;
  2. symmetry molecular orbitals (sigma_g / sigma_u — exact for H2 in a
     minimal basis, no SCF iteration needed);
  3. second-quantized electronic Hamiltonian in the 4-spin-orbital Fock
     space, built with dense Jordan-Wigner ladder operators (16 x 16);
  4. numerically exact Pauli-string decomposition ``w_P = tr(P H)/16`` —
     feeding the matrix-free :class:`..measure.PauliStringSet`;
  5. a pulse-level VQE problem over 4 qubits with hardware-style drives.

Oracles: the dense FCI ground energy at every R; at R = 0.7414 A the
electronic ground energy must reproduce the published value used by
:mod:`.vqe_h2` (-1.8512 Ha), and the RHF energy the textbook -1.1167 Ha
total (tests/test_molecule.py).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from scipy.special import erf

from ..dynamics.hamiltonian import ControlledHamiltonian
from ..measure import Measurement
from ..ops import cpx, linalg
from ..ops.cpx import CP
from ..pulses.envelope import SimpleEnvelope

ANGSTROM_TO_BOHR = 1.8897259886

# STO-3G hydrogen 1s: (exponent, contraction) with zeta = 1.24 scaling
STO3G_H = [(3.42525091, 0.15432897),
           (0.62391373, 0.53532814),
           (0.16885540, 0.44463454)]


def _boys0(t: np.ndarray) -> np.ndarray:
    t = np.asarray(t, dtype=float)
    small = t < 1e-12
    ts = np.where(small, 1.0, t)
    return np.where(small, 1.0, 0.5 * np.sqrt(np.pi / ts)
                    * erf(np.sqrt(ts)))


def _prims():
    """Normalized primitive (exponent, coefficient) pairs."""
    return [(a, c * (2.0 * a / np.pi) ** 0.75) for a, c in STO3G_H]


def h2_integrals(r_bohr: float):
    """AO integrals for two H 1s STO-3G functions separated by r (bohr):
    (S12, h_core [2,2], eri [2,2,2,2] chemist (ij|kl), E_nuc)."""
    centers = [np.zeros(3), np.array([0.0, 0.0, r_bohr])]
    prims = _prims()

    def s_kin_nuc(ca, cb):
        A, B = centers[ca], centers[cb]
        ab2 = float(np.dot(A - B, A - B))
        s = t = v = 0.0
        for a, na in prims:
            for b, nb in prims:
                p = a + b
                mu = a * b / p
                k = np.exp(-mu * ab2)
                pref = na * nb * (np.pi / p) ** 1.5 * k
                s += pref
                t += pref * mu * (3.0 - 2.0 * mu * ab2)
                P = (a * A + b * B) / p
                for C in centers:  # both nuclei, Z = 1
                    pc2 = float(np.dot(P - C, P - C))
                    v -= na * nb * 2.0 * np.pi / p * k * _boys0(p * pc2)
        return s, t + v

    s11, h11 = s_kin_nuc(0, 0)
    s12, h12 = s_kin_nuc(0, 1)
    h = np.array([[h11, h12], [h12, h11]])

    def eri(ci, cj, ck, cl):
        """(ij|kl) chemist notation."""
        A, B, C, D = (centers[x] for x in (ci, cj, ck, cl))
        out = 0.0
        for a, na in prims:
            for b, nb in prims:
                p = a + b
                P = (a * A + b * B) / p
                kab = np.exp(-a * b / p * float(np.dot(A - B, A - B)))
                for c, nc in prims:
                    for d, nd in prims:
                        q = c + d
                        Q = (c * C + d * D) / q
                        kcd = np.exp(-c * d / q
                                     * float(np.dot(C - D, C - D)))
                        t = p * q / (p + q) * float(np.dot(P - Q, P - Q))
                        out += (na * nb * nc * nd
                                * 2.0 * np.pi ** 2.5
                                / (p * q * np.sqrt(p + q))
                                * kab * kcd * _boys0(t))
        return out

    g = np.zeros((2, 2, 2, 2))
    for i in range(2):
        for j in range(2):
            for k in range(2):
                for l in range(2):
                    g[i, j, k, l] = eri(i, j, k, l)
    e_nuc = 1.0 / r_bohr
    return s12, h, g, e_nuc


def h2_mo_integrals(r_bohr: float):
    """Spatial MO integrals using the exact symmetry orbitals
    g = (1+2)/sqrt(2(1+S)), u = (1-2)/sqrt(2(1-S)):
    (h_mo [2,2] diagonal, g_mo [2,2,2,2] chemist, E_nuc)."""
    s12, h, g, e_nuc = h2_integrals(r_bohr)
    cg = np.array([1.0, 1.0]) / np.sqrt(2.0 * (1.0 + s12))
    cu = np.array([1.0, -1.0]) / np.sqrt(2.0 * (1.0 - s12))
    c = np.stack([cg, cu], axis=1)           # [ao, mo]
    h_mo = c.T @ h @ c
    g_mo = np.einsum("ijkl,ip,jq,kr,ls->pqrs", g, c, c, c, c)
    return h_mo, g_mo, e_nuc


def h2_electronic_hamiltonian(r_angstrom: float):
    """Dense 16 x 16 electronic Hamiltonian in the 4-spin-orbital Fock
    space (Jordan-Wigner order: g-up, g-down, u-up, u-down), plus E_nuc.

    H = sum h_pq a+_p a_q + 1/2 sum <pq|rs> a+_p a+_q a_s a_r with
    <pq|rs> = (pr|qs) spin-matched."""
    h_mo, g_mo, e_nuc = h2_mo_integrals(r_angstrom * ANGSTROM_TO_BOHR)
    n_so = 4

    def spatial(p):
        return p // 2

    def spin(p):
        return p % 2

    # dense JW ladder operators on 4 qubits (qubit p = spin orbital p)
    sm = np.array([[0.0, 1.0], [0.0, 0.0]])   # |0><1| annihilates
    z = np.diag([1.0, -1.0])
    eye = np.eye(2)

    def ann(p):
        ops = [z] * p + [sm] + [eye] * (n_so - p - 1)
        out = np.array([[1.0 + 0j]])
        for o in ops:
            out = np.kron(out, o)
        return out

    a = [ann(p) for p in range(n_so)]
    ad = [m.conj().T for m in a]

    H = np.zeros((2**n_so, 2**n_so), dtype=complex)
    for p in range(n_so):
        for q in range(n_so):
            if spin(p) == spin(q):
                H += h_mo[spatial(p), spatial(q)] * (ad[p] @ a[q])
    for p in range(n_so):
        for q in range(n_so):
            for r in range(n_so):
                for s in range(n_so):
                    if spin(p) == spin(r) and spin(q) == spin(s):
                        v = g_mo[spatial(p), spatial(r),
                                 spatial(q), spatial(s)]
                        H += 0.5 * v * (ad[p] @ ad[q] @ a[s] @ a[r])
    return H, e_nuc


_PAULIS = {"I": np.eye(2), "X": np.array([[0, 1], [1, 0]]),
           "Y": np.array([[0, -1j], [1j, 0]]), "Z": np.diag([1.0, -1.0])}


def pauli_decompose(H: np.ndarray, tol: float = 1e-10):
    """Numerically exact (label, weight) decomposition of a Hermitian
    matrix on n qubits: w_P = tr(P H) / 2^n."""
    n = int(round(np.log2(H.shape[0])))
    import itertools
    terms = []
    for labels in itertools.product("IXYZ", repeat=n):
        p = np.array([[1.0 + 0j]])
        for ch in labels:
            p = np.kron(p, _PAULIS[ch])
        w = np.real_if_close(np.trace(p @ H)) / 2**n
        if abs(w) > tol:
            if abs(np.imag(w)) > 1e-9:
                raise ValueError("non-Hermitian input")
            terms.append(("".join(labels), float(np.real(w))))
    return terms


@dataclasses.dataclass
class MoleculeProblem:
    ham: ControlledHamiltonian
    envelope: SimpleEnvelope
    measurement: Measurement
    psi0: CP
    T: float
    exact_ground_energy: float   # electronic (add e_nuc for total)
    e_nuc: float
    terms: list


def build_h2_at(r_angstrom: float, n_basis: int = 6, basis: str = "bspline",
                T: float = 2.0, omega: float = np.pi, dtype=jnp.float32,
                sampling: bool = False, noisy: bool = False) -> MoleculeProblem:
    """Pulse-level VQE problem for H2 at bond length ``r_angstrom`` (4-qubit
    Jordan-Wigner encoding, matrix-free string measurement). The initial
    state is the Hartree-Fock determinant |1100> (sigma_g doubly occupied)."""
    H, e_nuc = h2_electronic_hamiltonian(r_angstrom)
    terms = pauli_decompose(H)
    exact = float(np.linalg.eigvalsh(H)[0])

    meas = Measurement.create_strings(terms, dtype=dtype, sampling=sampling,
                                      noisy=noisy)
    # hardware-style drives: X and Y per qubit + nearest-neighbor XX/ZZ
    Hs, omegas = [], []
    for q in range(4):
        for ax in ("X", "Y"):
            Hs.append(linalg.pauli_string("".join(
                ax if p == q else "I" for p in range(4))))
            omegas.append(omega)
    for i in range(3):
        for kind in ("XX", "ZZ"):
            Hs.append(linalg.pauli_string("".join(
                kind[0] if p in (i, i + 1) else "I" for p in range(4))))
            omegas.append(omega)
    ham = ControlledHamiltonian.create(np.zeros((16, 16)), Hs, dtype=dtype)
    env = SimpleEnvelope(basis=basis, n_basis=n_basis, omegas=tuple(omegas))
    psi0 = cpx.from_complex(linalg.basis_state(0b1100, 16), dtype=dtype)
    return MoleculeProblem(ham=ham, envelope=env, measurement=meas,
                           psi0=psi0, T=float(T),
                           exact_ground_energy=exact, e_nuc=e_nuc,
                           terms=terms)


def rhf_energy(r_angstrom: float) -> float:
    """Closed-shell RHF total energy (sigma_g doubly occupied) — a textbook
    anchor: -1.1167 Ha at R = 0.7414 A."""
    h_mo, g_mo, e_nuc = h2_mo_integrals(r_angstrom * ANGSTROM_TO_BOHR)
    return float(2.0 * h_mo[0, 0] + g_mo[0, 0, 0, 0] + e_nuc)


def fci_energy(r_angstrom: float) -> float:
    """Exact (FCI) total energy in the STO-3G basis."""
    H, e_nuc = h2_electronic_hamiltonian(r_angstrom)
    return float(np.linalg.eigvalsh(H)[0] + e_nuc)
