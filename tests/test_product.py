"""Product-formula backend vs the dense propagator (structured maxcut)."""
import jax
import jax.numpy as jnp
import numpy as np

from diffquantum_tpu.dynamics.product import evolve_product
from diffquantum_tpu.dynamics.propagator import evolve, reference_n_steps
from diffquantum_tpu.models import maxcut
from diffquantum_tpu.ops import cpx

F64 = jnp.float64


def test_product_matches_dense_on_maxcut():
    prob = maxcut.demo_problem(dtype=F64)
    rng = np.random.default_rng(0)
    coeff = jnp.asarray(rng.standard_normal(prob.envelope.coeff_shape) * 0.4)
    per_step = 60  # fine grid: Strang splitting error O(dt^2) global
    n_steps = reference_n_steps(per_step, 0.0, prob.T)
    dense = evolve(prob.ham, prob.envelope, coeff, prob.psi0, 0.0, prob.T,
                   horizon=prob.T, n_steps=n_steps, backend="expm")
    prod = evolve_product(prob.ham, prob.envelope, coeff, prob.psi0, 0.0,
                          prob.T, horizon=prob.T, n_steps=n_steps)
    f = abs(np.vdot(cpx.to_complex(dense), cpx.to_complex(prod))) ** 2
    assert f > 1 - 1e-6, f


def test_product_converges_with_step_refinement():
    prob = maxcut.demo_problem(dtype=F64)
    rng = np.random.default_rng(1)
    coeff = jnp.asarray(rng.standard_normal(prob.envelope.coeff_shape) * 0.4)
    n_ref = reference_n_steps(200, 0.0, prob.T)
    ref = evolve(prob.ham, prob.envelope, coeff, prob.psi0, 0.0, prob.T,
                 horizon=prob.T, n_steps=n_ref, backend="expm")
    errs = []
    for per_step in (10, 40):
        n_steps = reference_n_steps(per_step, 0.0, prob.T)
        prod = evolve_product(prob.ham, prob.envelope, coeff, prob.psi0, 0.0,
                              prob.T, horizon=prob.T, n_steps=n_steps)
        errs.append(1 - abs(np.vdot(cpx.to_complex(ref),
                                    cpx.to_complex(prod))) ** 2)
    # 4x finer steps → error drops by ~16x (2nd order); allow slack
    assert errs[1] < errs[0] / 8, errs


def test_product_batched_and_differentiable():
    prob = maxcut.demo_problem(dtype=F64)
    rng = np.random.default_rng(2)
    coeff = jnp.asarray(rng.standard_normal(prob.envelope.coeff_shape) * 0.3)
    n_steps = 40
    batch = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), prob.psi0)
    out = evolve_product(prob.ham, prob.envelope, coeff, batch, 0.0, prob.T,
                         horizon=prob.T, n_steps=n_steps)
    assert out.re.shape == (2, 16)
    norms = np.asarray(cpx.norm2(out))
    np.testing.assert_allclose(norms, 1.0, atol=1e-10)

    def loss(c):
        psi = evolve_product(prob.ham, prob.envelope, c, prob.psi0, 0.0,
                             prob.T, horizon=prob.T, n_steps=n_steps)
        from diffquantum_tpu.measure import exact_expectation
        return exact_expectation(prob.measurement.matrix, psi)

    g = jax.grad(loss)(coeff)
    assert np.all(np.isfinite(np.asarray(g)))
    # cross-check against dense adjoint on same grid (splitting bias small)
    def loss_dense(c):
        psi = evolve(prob.ham, prob.envelope, c, prob.psi0, 0.0, prob.T,
                     horizon=prob.T, n_steps=n_steps, backend="expm")
        from diffquantum_tpu.measure import exact_expectation
        return exact_expectation(prob.measurement.matrix, psi)

    gd = jax.grad(loss_dense)(coeff)
    cos = (np.asarray(g).ravel() @ np.asarray(gd).ravel()) / (
        np.linalg.norm(np.asarray(g)) * np.linalg.norm(np.asarray(gd)))
    assert cos > 0.999, cos


def test_product_16_qubit_scales():
    # BASELINE.md stretch shape: 16 qubits via ring maxcut, no dense matrix.
    n = 16
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4, dtype=F64)
    rng = np.random.default_rng(3)
    coeff = jnp.asarray(rng.standard_normal(prob.envelope.coeff_shape) * 0.2)
    out = evolve_product(prob.ham, prob.envelope, coeff, prob.psi0, 0.0,
                         prob.T, horizon=prob.T, n_steps=30)
    assert out.re.shape == (2**n,)
    assert abs(float(cpx.norm2(out)) - 1.0) < 1e-9


def test_1q_z_drive_normalized_to_diag():
    """A hand-tagged 1q Z (diagonal local) must route through the phase
    block: exact vs dense, and fused eligibility preserved."""
    from diffquantum_tpu.ops import cpx, linalg
    from diffquantum_tpu.dynamics.hamiltonian import (ControlledHamiltonian,
                                                      TermStructure)
    from diffquantum_tpu.dynamics.product import (evolve_product,
                                                  fused_eligible,
                                                  split_structure)
    from diffquantum_tpu.dynamics.propagator import evolve
    from diffquantum_tpu.pulses.envelope import SimpleEnvelope

    n = 3
    H0 = np.zeros((8, 8))
    Hs = [linalg.pauli_string("IZI"), linalg.pauli_string("XII")]
    structure = (TermStructure(kind="1q", qubit=1, local=np.diag([1., -1.])),
                 TermStructure(kind="1q", qubit=0, local=linalg.X))
    ham = ControlledHamiltonian.create(
        H0, Hs, dtype=jnp.float64, structure=structure,
        h0_structure=TermStructure(kind="diag", diag=np.zeros(8)))
    (diag_idx, diag_rows, _, oneq_idx, _, _) = split_structure(ham)
    assert diag_idx == [0] and oneq_idx == [1]
    np.testing.assert_allclose(diag_rows[0], linalg.pauli_string("IZI")
                               .diagonal().real)

    env = SimpleEnvelope(basis="bspline", n_basis=4, omegas=(np.pi, np.pi))
    rng = np.random.default_rng(0)
    coeff = jnp.asarray(rng.standard_normal((2, 4)) * 0.5)
    psi0 = cpx.from_complex(linalg.uniform_superposition(3), jnp.float64)
    a = evolve_product(ham, env, coeff, psi0, 0.0, 2.0, horizon=2.0,
                       n_steps=600)
    b = evolve(ham, env, coeff, psi0, 0.0, 2.0, horizon=2.0, n_steps=600,
               backend="expm")
    assert np.abs(cpx.to_complex(a) - cpx.to_complex(b)).max() < 2e-5

    # 10q version is fused-eligible despite the Z drive
    big = [TermStructure(kind="1q", qubit=q, local=linalg.X)
           for q in range(10)] + \
          [TermStructure(kind="1q", qubit=0, local=np.diag([1., -1.]))]
    ham10 = ControlledHamiltonian.create_structured(
        1024, big, h0_structure=TermStructure(kind="diag",
                                              diag=np.zeros(1024)),
        dtype=jnp.float32)
    assert fused_eligible(ham10)


def test_hop_term_matches_dense():
    """'hop' (XX+YY) structured drives: exact subspace-rotation exponential
    vs the dense expm backend, including non-adjacent pairs, palindromic
    mixing with overlapping 1q drives, and (H_k psi) application."""
    from diffquantum_tpu.dynamics.hamiltonian import (ControlledHamiltonian,
                                                      TermStructure)
    from diffquantum_tpu.dynamics.product import (apply_hop_operator,
                                                  evolve_product)
    from diffquantum_tpu.dynamics.propagator import evolve
    from diffquantum_tpu.ops import linalg
    from diffquantum_tpu.pulses.envelope import SimpleEnvelope

    n, d = 3, 8
    hop02 = linalg.pauli_string("XIX") + linalg.pauli_string("YIY")
    Hs = [hop02, linalg.pauli_string("IXI"), linalg.pauli_string("XII")]
    structure = (TermStructure(kind="hop", qubit=0, qubit2=2),
                 TermStructure(kind="1q", qubit=1, local=linalg.X),
                 TermStructure(kind="1q", qubit=0, local=linalg.X))
    ham = ControlledHamiltonian.create(
        np.zeros((d, d)), Hs, dtype=jnp.float64, structure=structure,
        h0_structure=TermStructure(kind="diag", diag=np.zeros(d)))
    env = SimpleEnvelope(basis="bspline", n_basis=4, omegas=(np.pi,) * 3)
    rng = np.random.default_rng(0)
    coeff = jnp.asarray(rng.standard_normal((3, 4)) * 0.5)
    psi0 = cpx.from_complex(linalg.uniform_superposition(3), jnp.float64)
    a = evolve_product(ham, env, coeff, psi0, 0.0, 2.0, horizon=2.0,
                       n_steps=800)
    b = evolve(ham, env, coeff, psi0, 0.0, 2.0, horizon=2.0, n_steps=800,
               backend="expm")
    err = np.abs(cpx.to_complex(a) - cpx.to_complex(b)).max()
    assert err < 2e-5, err
    # norm preserved (unitary subspace rotation)
    np.testing.assert_allclose(float(cpx.norm2(a)), 1.0, atol=1e-10)
    # (H_k psi) application for the MC estimator
    v = rng.standard_normal(d) + 1j * rng.standard_normal(d)
    got = cpx.to_complex(apply_hop_operator(
        cpx.from_complex(v, jnp.float64), 0, 2, 3))
    np.testing.assert_allclose(got, hop02 @ v, atol=1e-12)


def test_hop_conserves_particle_number():
    """Hopping drives keep the state exactly in its occupation sector."""
    from diffquantum_tpu.dynamics.hamiltonian import (ControlledHamiltonian,
                                                      TermStructure)
    from diffquantum_tpu.dynamics.product import evolve_product
    from diffquantum_tpu.ops import linalg
    from diffquantum_tpu.pulses.envelope import SimpleEnvelope
    n, d = 4, 16
    structure = tuple(TermStructure(kind="hop", qubit=i, qubit2=i + 1)
                      for i in range(3))
    ham = ControlledHamiltonian.create_structured(
        d, structure, h0_structure=TermStructure(kind="diag",
                                                 diag=np.zeros(d)),
        dtype=jnp.float64)
    env = SimpleEnvelope(basis="bspline", n_basis=4, omegas=(np.pi,) * 3)
    rng = np.random.default_rng(1)
    coeff = jnp.asarray(rng.standard_normal((3, 4)))
    psi0 = cpx.from_complex(linalg.basis_state(0b1100, d), jnp.float64)
    psi = evolve_product(ham, env, coeff, psi0, 0.0, 2.0, horizon=2.0,
                         n_steps=100)
    p2 = np.asarray(cpx.abs2(psi))
    out_of_sector = sum(p2[j] for j in range(d)
                        if bin(j).count("1") != 2)
    assert out_of_sector < 1e-20, out_of_sector
