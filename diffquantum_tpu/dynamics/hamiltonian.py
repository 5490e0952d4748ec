"""Controlled-Hamiltonian container: H(t) = H0 + sum_k u_k(t) H_k.

The reference passes Hamiltonians as QuTiP-style nested lists
``[H0, [H_1, u_1], [H_2, u_2], ...]`` (`/root/reference/sim_plain.py:272-274`)
or copies them into C++ globals (`/root/reference/diffqc.cc:43-73`). Here the
system is an immutable pytree holding the drift ``H0`` and the stacked
control operators ``Hs [n_controls, d, d]`` in the real-pair CP
representation (TPU has no native complex; see ops/cpx.py), plus
statically-known spectral norms used to pick expm orders without
data-dependent control flow.

Optional *structure* metadata (diagonal / single-qubit terms) unlocks the
product-formula backend that scales past dense-matrix sizes
(:mod:`diffquantum_tpu.dynamics.product`).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cpx
from ..ops.cpx import CP


def spectral_norm_bound(m: np.ndarray) -> float:
    """Tight-ish spectral norm: exact (eigvalsh) for Hermitian inputs,
    Frobenius upper bound otherwise. Runs once at construction (numpy)."""
    m = np.asarray(m)
    if m.size == 0:
        return 0.0
    if np.allclose(m, m.conj().T, atol=1e-10):
        return float(np.max(np.abs(np.linalg.eigvalsh(m))))
    return float(np.linalg.norm(m))


@dataclasses.dataclass(frozen=True, eq=False)
class TermStructure:
    """Structure tag for one control term, enabling matrix-free application.

    ``eq=False``: instances compare/hash by identity — they ride in pytree
    *metadata* (static aux data), where jit cache lookups require hashable,
    cheap-equality objects; numpy array fields would otherwise break the
    comparison. Reusing the same problem object hits the jit cache; a newly
    built problem retraces (correct, just slower once).

    kind:
      - 'diag': term is diagonal; ``diag`` holds the length-d real diagonal.
      - '1q'  : single-qubit operator; ``qubit`` is the site (0 = MSB in the
                kron ordering), ``local`` the 2x2 complex matrix.
      - 'hop' : the hopping / exchange pair ``X_i X_j + Y_i Y_j`` on sites
                (``qubit``, ``qubit2``) — conserves particle number; its
                exponential is a closed-form rotation on the {01, 10}
                subspace (used by molecular drive sets).
      - 'dense': no structure (fallback to dense matvec).
    """

    kind: str
    qubit: int = -1
    local: Optional[np.ndarray] = None
    diag: Optional[np.ndarray] = None
    qubit2: int = -1


def classify_operator(m: np.ndarray, tol: float = 1e-10) -> TermStructure:
    """Classify one dense operator as 'diag', '1q' (I x..x G x..x I) or
    'dense'. Runs once at construction on the host (numpy).

    The reference's API takes raw dense matrices (`/root/reference/
    sim_plain.py:272-274`, `diffqc.cc:43-73`); this detector lets such
    inputs ride the product/fused engines without hand-written tags."""
    m = np.asarray(m, dtype=np.complex128)
    d = m.shape[0]
    if np.max(np.abs(m - np.diag(np.diagonal(m)))) <= tol \
            and np.max(np.abs(np.diagonal(m).imag)) <= tol:
        return TermStructure(kind="diag", diag=np.real(np.diagonal(m)).copy())
    n = int(round(np.log2(d)))
    if 2**n == d:
        for q in range(n):
            l, r = 2**q, 2 ** (n - q - 1)
            t = m.reshape(l, 2, r, l, 2, r)
            g = t[0, :, 0, 0, :, 0]
            if np.allclose(m, np.kron(np.eye(l), np.kron(g, np.eye(r))),
                           atol=tol):
                return TermStructure(kind="1q", qubit=q, local=g.copy())
    return TermStructure(kind="dense")


def detect_structure(H0, Hs, tol: float = 1e-10):
    """(structure, h0_structure) tags for dense inputs, or (None, None) when
    the problem is not fully structured (some term neither diagonal nor
    single-qubit, or H0 not diagonal) — the product backend could not be
    used then anyway, so no partial tags are attached."""
    h0 = classify_operator(H0, tol)
    if h0.kind != "diag":
        return None, None
    tags = tuple(classify_operator(h, tol) for h in Hs)
    if any(t.kind == "dense" for t in tags):
        return None, None
    return tags, h0


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ControlledHamiltonian:
    """H(t) = H0 + sum_k u_k(t) H_k with static norm metadata (CP storage)."""

    H0: CP                   # [d, d]
    Hs: CP                   # [n_controls, d, d]
    h0_norm: float           # static ||H0||_2 bound
    hs_norms: tuple[float, ...]  # static per-control ||H_k||_2 bounds
    structure: Optional[tuple[TermStructure, ...]] = None
    h0_structure: Optional[TermStructure] = None
    n_qubits: int = -1

    # -- pytree plumbing (arrays are leaves; norms/structure are static) ----
    def tree_flatten(self):
        return (self.H0, self.Hs), (self.h0_norm, self.hs_norms,
                                    self.structure, self.h0_structure,
                                    self.n_qubits)

    @classmethod
    def tree_unflatten(cls, aux, children):
        H0, Hs = children
        h0_norm, hs_norms, structure, h0_structure, n_qubits = aux
        return cls(H0=H0, Hs=Hs, h0_norm=h0_norm, hs_norms=hs_norms,
                   structure=structure, h0_structure=h0_structure,
                   n_qubits=n_qubits)

    # ------------------------------------------------------------------
    @classmethod
    def create(cls, H0, Hs: Sequence, dtype=jnp.float32,
               structure: Optional[Sequence[TermStructure]] = None,
               h0_structure: Optional[TermStructure] = None,
               auto_structure: bool = False) -> "ControlledHamiltonian":
        """Build from host-side (complex) numpy operators.

        ``dtype`` is the REAL storage dtype (float32 on TPU, float64 for
        high-precision CPU runs). ``auto_structure=True`` runs
        :func:`detect_structure` on the dense inputs so fully diag/1q
        problems gain the product/fused backends without hand-written
        tags (no-op when explicit tags are passed or detection fails)."""
        H0_np = np.asarray(H0, dtype=np.complex128)
        Hs_np = np.stack([np.asarray(h, dtype=np.complex128) for h in Hs]) \
            if len(Hs) else np.zeros((0,) + H0_np.shape, dtype=np.complex128)
        if auto_structure and structure is None:
            structure, h0_structure = detect_structure(H0_np, Hs_np)
        d = H0_np.shape[0]
        n_qubits = int(round(np.log2(d))) if d & (d - 1) == 0 else -1
        return cls(
            H0=cpx.from_complex(H0_np, dtype=dtype),
            Hs=cpx.from_complex(Hs_np, dtype=dtype),
            h0_norm=spectral_norm_bound(H0_np),
            hs_norms=tuple(spectral_norm_bound(h) for h in Hs_np),
            structure=tuple(structure) if structure is not None else None,
            h0_structure=h0_structure,
            n_qubits=n_qubits,
        )

    @classmethod
    def create_structured(cls, dim: int,
                          structure: Sequence[TermStructure],
                          h0_structure: Optional[TermStructure] = None,
                          dtype=jnp.float32) -> "ControlledHamiltonian":
        """Matrix-free construction: store ONLY structure metadata (diag
        vectors / 2x2 locals), no dense 2^n x 2^n operators. Required beyond
        ~13 qubits; usable only with the product backend
        (:mod:`.product`) and the adjoint/FD gradient paths."""
        if h0_structure is None:
            h0_structure = TermStructure(kind="diag",
                                         diag=np.zeros(dim))
        norms = []
        for st in structure:
            if st.kind == "diag":
                norms.append(float(np.max(np.abs(st.diag))))
            elif st.kind == "1q":
                norms.append(spectral_norm_bound(st.local))
            elif st.kind == "hop":
                norms.append(2.0)   # ||XX + YY|| = 2
            else:
                raise ValueError(
                    "structured terms must be 'diag', '1q' or 'hop'")
        h0_norm = float(np.max(np.abs(h0_structure.diag))) \
            if h0_structure.kind == "diag" else spectral_norm_bound(
                h0_structure.local)
        placeholder = cpx.zeros((0,), dtype=dtype)
        n_qubits = int(round(np.log2(dim)))
        return cls(H0=placeholder, Hs=placeholder, h0_norm=h0_norm,
                   hs_norms=tuple(norms), structure=tuple(structure),
                   h0_structure=h0_structure, n_qubits=n_qubits)

    @property
    def is_structured_only(self) -> bool:
        return self.H0.re.ndim != 2

    @property
    def dim(self) -> int:
        if self.is_structured_only:
            return 2**self.n_qubits
        return self.H0.shape[-1]

    @property
    def n_controls(self) -> int:
        return len(self.hs_norms)

    @property
    def dtype(self):
        return self.H0.dtype

    def norm_bound(self, u_max: Sequence[float]) -> float:
        """Static bound on ||H(t)|| given per-control amplitude bounds
        (typically the envelope's omegas)."""
        return self.h0_norm + float(
            sum(abs(u) * n for u, n in zip(u_max, self.hs_norms)))

    def at(self, u_t: jnp.ndarray) -> CP:
        """Dense H(t) for one real amplitude vector u_t [n_controls]."""
        if self.n_controls == 0:
            return self.H0
        mix = cpx.tensordot_weights(u_t.astype(self.dtype), self.Hs)
        return cpx.add(self.H0, mix)
