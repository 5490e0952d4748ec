"""Trajectory evolution + fused-kernel long-chain reconstruction drift."""
import jax
import jax.numpy as jnp
import numpy as np

from diffquantum_tpu.dynamics.propagator import evolve, evolve_trajectory
from diffquantum_tpu.dynamics.hamiltonian import ControlledHamiltonian
from diffquantum_tpu.ops import cpx, linalg
from diffquantum_tpu.pulses.envelope import SimpleEnvelope
import pytest

F64 = jnp.float64


def test_trajectory_endpoints_and_norms():
    rng = np.random.default_rng(0)
    H0 = np.zeros((4, 4))
    Hs = [linalg.pauli_string("XI"), linalg.pauli_string("ZZ")]
    ham = ControlledHamiltonian.create(H0, Hs, dtype=F64)
    env = SimpleEnvelope(basis="bspline", n_basis=4, omegas=(np.pi, np.pi))
    coeff = jnp.asarray(rng.standard_normal((2, 4)) * 0.4)
    psi0 = cpx.from_complex(linalg.uniform_superposition(2), F64)
    T, n_steps = 2.0, 25

    traj = evolve_trajectory(ham, env, coeff, psi0, 0.0, T, horizon=T,
                             n_steps=n_steps)
    assert traj.re.shape == (n_steps + 1, 4)
    np.testing.assert_allclose(cpx.to_complex(traj[0]),
                               cpx.to_complex(psi0), atol=1e-14)
    final = evolve(ham, env, coeff, psi0, 0.0, T, horizon=T, n_steps=n_steps,
                   backend="expm")
    np.testing.assert_allclose(cpx.to_complex(traj[n_steps]),
                               cpx.to_complex(final), atol=1e-12)
    norms = np.asarray(cpx.norm2(traj))
    np.testing.assert_allclose(norms, 1.0, atol=1e-10)


@pytest.mark.slow
def test_fused_backward_reconstruction_long_chain():
    """The fused VJP reconstructs states by inverting unitaries step-by-step
    in f32; over 200 steps the gradient must still match the XLA adjoint
    (which reconstructs by remat) to f32 accuracy."""
    from diffquantum_tpu.dynamics.product import (evolve_product,
                                                  evolve_product_fused)
    from diffquantum_tpu.models import maxcut

    prob = maxcut.build_maxcut(10, maxcut.ring_graph(10), n_basis=4,
                               dense=False)
    rng = np.random.default_rng(1)
    coeff = jnp.asarray(
        rng.standard_normal(prob.envelope.coeff_shape).astype(np.float32)
        * 0.3)
    n_steps = 200

    def loss(evolver):
        def f(c):
            psi = evolver(prob.ham, prob.envelope, c, prob.psi0, 0.0,
                          prob.T, horizon=prob.T, n_steps=n_steps)
            return jnp.sum(cpx.abs2(psi) * prob.measurement.diag, axis=-1)
        return f

    g_fused = jax.grad(loss(evolve_product_fused))(coeff)
    g_xla = jax.grad(loss(evolve_product))(coeff)
    a, b = np.asarray(g_fused).ravel(), np.asarray(g_xla).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 1 - 1e-5, cos
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-5)


def test_product_trajectory_matches_stepwise():
    """Structured-trajectory semantics: endpoints equal evolve_product, the
    whole history equals the dense evolve_trajectory on an overlapping
    problem."""
    from diffquantum_tpu.dynamics.product import (evolve_product,
                                                  evolve_product_trajectory)
    from diffquantum_tpu.dynamics.hamiltonian import TermStructure

    rng = np.random.default_rng(3)
    structure = (TermStructure(kind="diag",
                               diag=linalg.pauli_string("ZZ")
                               .diagonal().real),
                 TermStructure(kind="1q", qubit=0, local=linalg.X))
    Hs = [np.diag(linalg.pauli_string("ZZ").diagonal().real),
          linalg.pauli_string("XI")]
    ham = ControlledHamiltonian.create(
        np.zeros((4, 4)), Hs, dtype=F64, structure=structure,
        h0_structure=TermStructure(kind="diag", diag=np.zeros(4)))
    env = SimpleEnvelope(basis="bspline", n_basis=4, omegas=(np.pi, np.pi))
    coeff = jnp.asarray(rng.standard_normal((2, 4)) * 0.5)
    psi0 = cpx.from_complex(linalg.uniform_superposition(2), F64)
    T, n_steps = 2.0, 40

    traj = evolve_product_trajectory(ham, env, coeff, psi0, 0.0, T,
                                     horizon=T, n_steps=n_steps)
    assert traj.re.shape == (n_steps + 1, 4)
    np.testing.assert_allclose(cpx.to_complex(traj[0]),
                               cpx.to_complex(psi0), atol=1e-14)
    final = evolve_product(ham, env, coeff, psi0, 0.0, T, horizon=T,
                           n_steps=n_steps)
    np.testing.assert_allclose(cpx.to_complex(traj[n_steps]),
                               cpx.to_complex(final), atol=1e-12)
    # every intermediate state equals a shorter evolution to that grid time
    for k in (10, 25):
        part = evolve_product(ham, env, coeff, psi0, 0.0, k * T / n_steps,
                              horizon=T, n_steps=k)
        np.testing.assert_allclose(cpx.to_complex(traj[k]),
                                   cpx.to_complex(part), atol=1e-12)
    norms = np.asarray(cpx.norm2(traj))
    np.testing.assert_allclose(norms, 1.0, atol=1e-10)
