"""Automatic structure detection for dense operator inputs.

The reference API takes raw dense matrices (`/root/reference/
sim_plain.py:272-274`, `diffqc.cc:43-73`); ``auto_structure=True`` must tag
fully diag/1q problems so they ride the product/fused engines with no
hand-written TermStructure metadata — and must refuse to tag partially
structured problems (where the product backend could not run anyway).
"""
import jax.numpy as jnp
import numpy as np

from diffquantum_tpu.dynamics.hamiltonian import (ControlledHamiltonian,
                                                  classify_operator,
                                                  detect_structure)
from diffquantum_tpu.dynamics.propagator import evolve
from diffquantum_tpu.ops import cpx, linalg
from diffquantum_tpu.pulses.envelope import SimpleEnvelope

F64 = jnp.float64


def test_classify_operator_kinds():
    assert classify_operator(linalg.pauli_string("ZZI")).kind == "diag"
    # Z drives are diagonal — classified 'diag', not '1q'
    assert classify_operator(linalg.pauli_string("ZII")).kind == "diag"

    st = classify_operator(linalg.pauli_string("IXI"))
    assert st.kind == "1q" and st.qubit == 1
    np.testing.assert_allclose(st.local, [[0, 1], [1, 0]])

    st = classify_operator(linalg.pauli_string("IIY"))
    assert st.kind == "1q" and st.qubit == 2
    np.testing.assert_allclose(st.local, [[0, -1j], [1j, 0]])

    assert classify_operator(linalg.pauli_string("XXI")).kind == "dense"


def test_detect_structure_refuses_partial():
    Hs = [linalg.pauli_string("IXI"), linalg.pauli_string("XXI")]
    tags, h0 = detect_structure(np.zeros((8, 8)), Hs)
    assert tags is None and h0 is None
    # non-diagonal H0 also disqualifies
    tags, h0 = detect_structure(linalg.pauli_string("XII"),
                                [linalg.pauli_string("IXI")])
    assert tags is None


def test_auto_structure_create_and_evolve_matches_dense():
    H0 = 0.3 * linalg.pauli_string("ZZI")
    Hs = [linalg.pauli_string("ZZI"), linalg.pauli_string("IXI"),
          linalg.pauli_string("IIY")]
    ham_auto = ControlledHamiltonian.create(H0, Hs, dtype=F64,
                                            auto_structure=True)
    assert ham_auto.structure is not None
    assert ham_auto.h0_structure.kind == "diag"
    kinds = [st.kind for st in ham_auto.structure]
    assert kinds == ["diag", "1q", "1q"]

    ham_plain = ControlledHamiltonian.create(H0, Hs, dtype=F64)
    assert ham_plain.structure is None  # opt-in only

    env = SimpleEnvelope(basis="bspline", n_basis=4, omegas=(np.pi,) * 3)
    rng = np.random.default_rng(0)
    coeff = jnp.asarray(rng.standard_normal((3, 4)) * 0.3)
    psi0 = cpx.from_complex(linalg.uniform_superposition(3), F64)
    a = evolve(ham_auto, env, coeff, psi0, 0.0, 2.0, horizon=2.0,
               n_steps=400, backend="product")
    b = evolve(ham_plain, env, coeff, psi0, 0.0, 2.0, horizon=2.0,
               n_steps=400, backend="expm")
    err = np.abs(cpx.to_complex(a) - cpx.to_complex(b)).max()
    assert err < 5e-5  # second-order splitting error at dt = 5e-3
