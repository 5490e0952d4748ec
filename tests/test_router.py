"""The engine routing table (dynamics/product.py::select_engine) —
every regime boundary pinned by a unit test (VERDICT r3 #6/#7: the
routing rules were prose-only and load-bearing)."""
import jax.numpy as jnp
import numpy as np
import pytest

from diffquantum_tpu.dynamics.hamiltonian import (ControlledHamiltonian,
                                                  TermStructure)
from diffquantum_tpu.dynamics.product import fused_eligible, select_engine
from diffquantum_tpu.models import maxcut
from diffquantum_tpu.ops import linalg
from tests.test_fused_hop import make_hop_problem


def _min_ham(n, hop=False):
    """Minimal QAOA-shaped structure (one ZZ row + X drives) — the ring
    builders materialize dozens of 2^n rows, too heavy for a router
    unit test at 24-25 qubits."""
    d = 2**n
    structure = [TermStructure(kind="diag",
                               diag=linalg.zz_diagonal(n, 0, 1)),
                 TermStructure(kind="1q", qubit=0, local=linalg.X),
                 TermStructure(kind="1q", qubit=n - 1, local=linalg.X)]
    if hop:
        structure.append(TermStructure(kind="hop", qubit=1, qubit2=2))
    return ControlledHamiltonian.create_structured(
        d, tuple(structure),
        h0_structure=TermStructure(kind="diag", diag=np.zeros(d)),
        dtype=jnp.float32)


@pytest.mark.parametrize("n,engine", [
    (10, "streamed"), (17, "streamed"),   # VMEM streamed band
    (18, "packed"),                       # packed VMEM band (18 only)
    (19, "mega"), (24, "mega"),           # chunked HBM mega band
])
def test_ring_boundaries(n, engine):
    assert select_engine(_min_ham(n)) == engine


@pytest.mark.slow
def test_out_of_band_sizes():
    assert select_engine(_min_ham(9)) == "xla"   # < 10: not worth a kernel
    assert select_engine(_min_ham(25)) == "xla"  # > 24: pass-B sublanes


@pytest.mark.parametrize("n,engine", [
    (17, "streamed"),   # hops ride the streamed op plan
    (18, "packed"),     # round 4: packed kernels carry hops
    (19, "mega_hop"),   # round 4: palindromic-schedule mega engine
    (24, "mega_hop"),
])
def test_hop_boundaries(n, engine):
    assert select_engine(_min_ham(n, hop=True)) == engine


def test_hop_layout_infeasible_falls_back():
    """A complete hop graph at 19q has no feasible chunk layout."""
    ham, *_ = make_hop_problem(
        19, [(i, j) for i in range(19) for j in range(i + 1, 19)],
        with_xy=False, with_zz=False)
    assert select_engine(ham) == "xla"
    assert not fused_eligible(ham)


def test_unpackable_diag_at_18q_falls_back():
    """Three-valued diagonal rows cannot pack into sign bit-planes —
    mandatory at 18+."""
    n, d = 18, 2**18
    r = np.zeros(d)
    r[: d // 4] = 2.0
    r[d // 4: d // 2] = 1.0
    structure = (TermStructure(kind="diag", diag=r),
                 TermStructure(kind="1q", qubit=0, local=linalg.X))
    ham = ControlledHamiltonian.create_structured(
        d, structure, h0_structure=TermStructure(kind="diag",
                                                 diag=np.zeros(d)),
        dtype=jnp.float32)
    assert select_engine(ham) == "xla"
    # the same rows at 17q stream their angle tables — no packing needed
    n, d = 17, 2**17
    r = np.zeros(d)
    r[: d // 4] = 2.0
    structure = (TermStructure(kind="diag", diag=r),
                 TermStructure(kind="1q", qubit=0, local=linalg.X))
    ham17 = ControlledHamiltonian.create_structured(
        d, structure, h0_structure=TermStructure(kind="diag",
                                                 diag=np.zeros(d)),
        dtype=jnp.float32)
    assert select_engine(ham17) == "streamed"


def test_lane_capacity_boundary():
    """Shared-qubit sequences double the angle row at VMEM sizes (>128
    lanes -> xla); 19+ engines halve angle VALUES so the plain count
    binds."""
    def many_xy(n, reps):
        d = 2**n
        structure, omegas = [], []
        for _ in range(reps):
            for q in range(n):
                for local in (linalg.X, linalg.Y):
                    structure.append(TermStructure(kind="1q", qubit=q,
                                                   local=local))
                    omegas.append(np.pi)
        return ControlledHamiltonian.create_structured(
            d, tuple(structure),
            h0_structure=TermStructure(kind="diag", diag=np.zeros(d)),
            dtype=jnp.float32)

    assert select_engine(many_xy(10, 3)) == "streamed"  # 60 rots x2 <= 128
    assert select_engine(many_xy(10, 4)) == "xla"       # 80 rots x2 > 128


def test_general_involutory_1q_falls_back():
    """Non-Pauli (but involutory) 1q generators have no fused rotation —
    the XLA product engine handles them."""
    h = np.array([[1, 1], [1, -1]]) / np.sqrt(2)  # Hadamard: H^2 = I
    structure = (TermStructure(kind="1q", qubit=0, local=h),)
    ham = ControlledHamiltonian.create_structured(
        2**10, structure,
        h0_structure=TermStructure(kind="diag", diag=np.zeros(2**10)),
        dtype=jnp.float32)
    assert select_engine(ham) == "xla"


def test_diagonal_1q_folds_into_phases():
    """A Z-like diagonal 1q drive costs no rotation slot and keeps
    eligibility."""
    structure = (TermStructure(kind="1q", qubit=2, local=linalg.Z),
                 TermStructure(kind="1q", qubit=0, local=linalg.X))
    ham = ControlledHamiltonian.create_structured(
        2**10, structure,
        h0_structure=TermStructure(kind="diag", diag=np.zeros(2**10)),
        dtype=jnp.float32)
    assert select_engine(ham) == "streamed"


def test_nondiag_h0_falls_back():
    """A non-diagonal drift H0 has no in-kernel phase form — xla only.
    (create_structured defaults a None h0 to zero diag, so build the ham
    and override the h0 structure metadata.)"""
    import dataclasses
    ham = ControlledHamiltonian.create_structured(
        2**10, (TermStructure(kind="1q", qubit=0, local=linalg.X),),
        dtype=jnp.float32)
    ham_nd = dataclasses.replace(
        ham, h0_structure=TermStructure(kind="1q", qubit=0,
                                        local=linalg.X)) \
        if dataclasses.is_dataclass(ham) else None
    if ham_nd is None:
        import copy
        ham_nd = copy.copy(ham)
        object.__setattr__(ham_nd, "h0_structure",
                           TermStructure(kind="1q", qubit=0,
                                         local=linalg.X))
    assert select_engine(ham_nd) == "xla"
