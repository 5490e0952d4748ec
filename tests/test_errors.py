"""Error-path behavior: clear failures instead of silent garbage."""
import jax.numpy as jnp
import numpy as np
import pytest

from diffquantum_tpu.dynamics.hamiltonian import (ControlledHamiltonian,
                                                  TermStructure)
from diffquantum_tpu.dynamics.product import fused_eligible
from diffquantum_tpu.dynamics.propagator import evolve
from diffquantum_tpu.measure import Measurement
from diffquantum_tpu.models import maxcut
from diffquantum_tpu.ops import cpx, linalg
from diffquantum_tpu.pulses.envelope import SimpleEnvelope


def test_dense_backend_on_structured_ham_raises():
    prob = maxcut.build_maxcut(5, maxcut.ring_graph(5), n_basis=4,
                               dense=False)
    coeff = jnp.zeros(prob.envelope.coeff_shape)
    with pytest.raises(ValueError, match="structure-only"):
        evolve(prob.ham, prob.envelope, coeff, prob.psi0, 0.0, prob.T,
               horizon=prob.T, n_steps=5, backend="expm")


def test_fused_accepts_xy_rejects_other_generators():
    st_y = [TermStructure(kind="1q", qubit=q, local=linalg.Y)
            for q in range(10)]
    assert fused_eligible(ControlledHamiltonian.create_structured(2**10, st_y))
    h = (linalg.X + linalg.Z) / np.sqrt(2)  # Hadamard-like: not X or Y
    st_h = [TermStructure(kind="1q", qubit=q, local=h) for q in range(10)]
    assert not fused_eligible(
        ControlledHamiltonian.create_structured(2**10, st_h))


def test_unknown_backend_raises():
    prob = maxcut.demo_problem(dtype=jnp.float64)
    coeff = jnp.zeros(prob.envelope.coeff_shape)
    with pytest.raises(ValueError, match="unknown backend"):
        evolve(prob.ham, prob.envelope, coeff, prob.psi0, 0.0, prob.T,
               horizon=prob.T, n_steps=5, backend="magnus")


def test_sampling_without_key_raises():
    m = Measurement.create(linalg.pauli_string("Z"),
                           terms=[(linalg.pauli_string("Z"), 1.0)],
                           dtype=jnp.float64, sampling=True)
    psi = cpx.from_complex(linalg.basis_state(0, 2), jnp.float64)
    with pytest.raises(ValueError, match="PRNG key"):
        m.expectation(psi)


def test_bspline_too_few_basis_raises():
    with pytest.raises(ValueError, match="n_basis >= 3"):
        SimpleEnvelope(basis="bspline", n_basis=2, omegas=(1.0,)).amplitudes(
            jnp.zeros((1, 2)), jnp.zeros(3), 1.0)


def test_mesh_too_many_devices_raises():
    from diffquantum_tpu.parallel.mesh import make_mesh
    with pytest.raises(ValueError, match="devices"):
        make_mesh({"data": 1024})
