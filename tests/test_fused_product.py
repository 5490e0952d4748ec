"""Fused Pallas whole-evolution kernel vs the XLA product backend —
forward states and custom-VJP gradients (interpret mode on CPU; the real
TPU path is exercised by bench.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from diffquantum_tpu.dynamics.product import (evolve_product,
                                              evolve_product_fused,
                                              fused_eligible)
from diffquantum_tpu.models import maxcut
from diffquantum_tpu.ops import cpx
import pytest


def make(n=10, n_basis=4, seed=0):
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=n_basis,
                               dense=False)
    rng = np.random.default_rng(seed)
    coeff = jnp.asarray(
        rng.standard_normal(prob.envelope.coeff_shape).astype(np.float32)
        * 0.4)
    return prob, coeff


def test_fused_forward_odd_sizes():
    # 11 qubits: R = 16 rows, 4 row-qubits + 7 lane-qubits
    prob, coeff = make(11, n_basis=4, seed=2)
    n_steps = 6
    want = evolve_product(prob.ham, prob.envelope, coeff, prob.psi0, 0.0,
                          prob.T, horizon=prob.T, n_steps=n_steps)
    got = evolve_product_fused(prob.ham, prob.envelope, coeff, prob.psi0,
                               0.0, prob.T, horizon=prob.T, n_steps=n_steps)
    np.testing.assert_allclose(cpx.to_complex(got), cpx.to_complex(want),
                               atol=5e-5)


def test_fused_eligibility():
    prob, _ = make(10)
    assert fused_eligible(prob.ham)
    small = maxcut.build_maxcut(4, maxcut.ring_graph(4), dense=False)
    assert not fused_eligible(small.ham)  # < 10 qubits


def test_fused_forward_matches_xla():
    prob, coeff = make(10)
    n_steps = 12
    want = evolve_product(prob.ham, prob.envelope, coeff, prob.psi0, 0.0,
                          prob.T, horizon=prob.T, n_steps=n_steps)
    got = evolve_product_fused(prob.ham, prob.envelope, coeff, prob.psi0,
                               0.0, prob.T, horizon=prob.T, n_steps=n_steps)
    # f32 path: different (but mathematically identical) op ordering than
    # the XLA scan → agreement at f32 roundoff
    f = abs(np.vdot(cpx.to_complex(want), cpx.to_complex(got))) ** 2
    assert f > 1 - 1e-5, f
    np.testing.assert_allclose(cpx.to_complex(got), cpx.to_complex(want),
                               atol=5e-5)


@pytest.mark.slow
def test_fused_batched_per_seed_matches_xla():
    prob, _ = make(10)
    rng = np.random.default_rng(3)
    b = 4
    coeffs = jnp.asarray(rng.standard_normal(
        (b,) + prob.envelope.coeff_shape).astype(np.float32) * 0.3)
    batch = jax.tree_util.tree_map(lambda x: jnp.stack([x] * b), prob.psi0)
    n_steps = 8
    got = evolve_product_fused(prob.ham, prob.envelope, coeffs, batch, 0.0,
                               prob.T, horizon=prob.T, n_steps=n_steps)
    want = jax.vmap(lambda c, p: evolve_product(
        prob.ham, prob.envelope, c, p, 0.0, prob.T, horizon=prob.T,
        n_steps=n_steps))(coeffs, batch)
    np.testing.assert_allclose(cpx.to_complex(got), cpx.to_complex(want),
                               atol=5e-5)

    # gradient of the batch-summed energy
    def loss_f(cs):
        psi = evolve_product_fused(prob.ham, prob.envelope, cs, batch, 0.0,
                                   prob.T, horizon=prob.T, n_steps=n_steps)
        return jnp.sum(cpx.abs2(psi) * prob.measurement.diag)

    def loss_x(cs):
        psi = jax.vmap(lambda c, p: evolve_product(
            prob.ham, prob.envelope, c, p, 0.0, prob.T, horizon=prob.T,
            n_steps=n_steps))(cs, batch)
        return jnp.sum(cpx.abs2(psi) * prob.measurement.diag)

    g_f = jax.grad(loss_f)(coeffs)
    g_x = jax.grad(loss_x)(coeffs)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x),
                               rtol=2e-3, atol=2e-5)


@pytest.mark.slow
def test_fused_gradient_matches_xla_adjoint():
    prob, coeff = make(10, seed=1)
    n_steps = 10

    def loss_fused(c):
        psi = evolve_product_fused(prob.ham, prob.envelope, c, prob.psi0,
                                   0.0, prob.T, horizon=prob.T,
                                   n_steps=n_steps)
        return jnp.sum(cpx.abs2(psi) * prob.measurement.diag, axis=-1)

    def loss_xla(c):
        psi = evolve_product(prob.ham, prob.envelope, c, prob.psi0, 0.0,
                             prob.T, horizon=prob.T, n_steps=n_steps)
        return jnp.sum(cpx.abs2(psi) * prob.measurement.diag, axis=-1)

    v1, g1 = jax.value_and_grad(loss_fused)(coeff)
    v2, g2 = jax.value_and_grad(loss_xla)(coeff)
    assert abs(float(v1) - float(v2)) < 1e-5
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-3, atol=2e-5)


@pytest.mark.slow
def test_fused_xy_drives_match_xla():
    """Mixed X+Y single-qubit drives through the fused kernel (Y uses
    signed-permutation real mixes) vs the XLA product backend, values and
    gradients."""
    from diffquantum_tpu.dynamics.hamiltonian import (ControlledHamiltonian,
                                                      TermStructure)
    from diffquantum_tpu.models.maxcut import ring_graph
    from diffquantum_tpu.ops import linalg

    n = 10
    rng = np.random.default_rng(9)
    structure, omegas = [], []
    for (i, j) in ring_graph(n):
        structure.append(TermStructure(
            kind="diag", diag=linalg.zz_diagonal(n, i, j)))
        omegas.append(np.pi)
    for q in range(n):  # alternate X / Y drives, covering rows and lanes
        local = linalg.X if q % 2 == 0 else linalg.Y
        structure.append(TermStructure(kind="1q", qubit=q, local=local))
        omegas.append(np.pi)
    ham = ControlledHamiltonian.create_structured(2**n, structure)
    assert fused_eligible(ham)
    from diffquantum_tpu.pulses.envelope import SimpleEnvelope
    env = SimpleEnvelope(basis="bspline", n_basis=4, omegas=tuple(omegas))
    coeff = jnp.asarray(
        rng.standard_normal(env.coeff_shape).astype(np.float32) * 0.4)
    psi0 = cpx.from_complex(linalg.uniform_superposition(n))
    T, n_steps = 2.0, 8
    diag = jnp.asarray(
        sum(-0.5 * (1.0 - linalg.zz_diagonal(n, i, j))
            for (i, j) in ring_graph(n)), jnp.float32)

    def loss(evolver):
        def f(c):
            psi = evolver(ham, env, c, psi0, 0.0, T, horizon=T,
                          n_steps=n_steps)
            return jnp.sum(cpx.abs2(psi) * diag, axis=-1)
        return f

    v_f, g_f = jax.value_and_grad(loss(evolve_product_fused))(coeff)
    v_x, g_x = jax.value_and_grad(loss(evolve_product))(coeff)
    assert abs(float(v_f) - float(v_x)) < 1e-5
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x),
                               rtol=2e-3, atol=2e-5)


def test_precision_knob_api():
    """precision='fast' accepted end-to-end (interpret mode on CPU computes
    both at f32, so results are identical here; numeric deltas are covered
    by the real-chip lane, tpu_tests)."""
    import pytest
    from diffquantum_tpu.dynamics.product import evolve_product_fused
    from diffquantum_tpu.models import maxcut
    prob = maxcut.build_maxcut(10, maxcut.ring_graph(10), n_basis=4,
                               dense=False)
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.standard_normal(
        prob.envelope.coeff_shape).astype(np.float32) * 1e-3)
    a = evolve_product_fused(prob.ham, prob.envelope, c, prob.psi0, 0.0,
                             prob.T, horizon=prob.T, n_steps=10)
    b = evolve_product_fused(prob.ham, prob.envelope, c, prob.psi0, 0.0,
                             prob.T, horizon=prob.T, n_steps=10,
                             precision="fast")
    np.testing.assert_allclose(np.asarray(a.re), np.asarray(b.re), atol=1e-7)
    with pytest.raises(ValueError, match="precision"):
        evolve_product_fused(prob.ham, prob.envelope, c, prob.psi0, 0.0,
                             prob.T, horizon=prob.T, n_steps=10,
                             precision="bogus")


def test_batched_fused_diag_only_problem():
    """Zero 1q drives (diag-only structured ham): the batched kernel's
    angle padding previously produced a size-0 block axis and crashed with
    a BlockSpec shape error."""
    from diffquantum_tpu.dynamics.hamiltonian import (ControlledHamiltonian,
                                                      TermStructure)
    from diffquantum_tpu.dynamics.product import (evolve_product,
                                                  evolve_product_fused)
    from diffquantum_tpu.ops import linalg
    n, d, b = 10, 1024, 4
    structure = tuple(TermStructure(kind="diag",
                                    diag=linalg.zz_diagonal(n, i, i + 1))
                      for i in range(n - 1))
    ham = ControlledHamiltonian.create_structured(
        d, structure, h0_structure=TermStructure(kind="diag",
                                                 diag=np.zeros(d)),
        dtype=jnp.float32)
    from diffquantum_tpu.pulses.envelope import SimpleEnvelope
    env = SimpleEnvelope(basis="bspline", n_basis=4,
                         omegas=(np.pi,) * (n - 1))
    rng = np.random.default_rng(0)
    coeff = jnp.asarray(rng.standard_normal((n - 1, 4)).astype(np.float32)
                        * 0.3)
    psi1 = cpx.from_complex(linalg.uniform_superposition(n), jnp.float32)
    psi_b = cpx.CP(jnp.broadcast_to(psi1.re, (b, d)),
                   jnp.broadcast_to(psi1.im, (b, d)))
    out = evolve_product_fused(ham, env, coeff, psi_b, 0.0, 2.0,
                               horizon=2.0, n_steps=8)
    ref = evolve_product(ham, env, coeff, psi1, 0.0, 2.0, horizon=2.0,
                         n_steps=8)
    for i in range(b):
        np.testing.assert_allclose(np.asarray(out.re[i]),
                                   np.asarray(ref.re), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.im[i]),
                                   np.asarray(ref.im), atol=1e-6)


def test_fused_rejects_non_pauli_kind():
    """Forcing backend='product_fused' with a non-X/Y involutory 1q
    generator must raise, not silently apply the wrong rotation."""
    import pytest
    from diffquantum_tpu.dynamics.hamiltonian import (ControlledHamiltonian,
                                                      TermStructure)
    from diffquantum_tpu.dynamics.product import evolve_product_fused
    from diffquantum_tpu.ops import linalg
    from diffquantum_tpu.pulses.envelope import SimpleEnvelope
    n, d = 10, 1024
    g = (np.array([[0, 1], [1, 0]]) + np.diag([1., -1.])) / np.sqrt(2)
    structure = (TermStructure(kind="1q", qubit=0, local=g),)
    ham = ControlledHamiltonian.create_structured(
        d, structure, h0_structure=TermStructure(kind="diag",
                                                 diag=np.zeros(d)),
        dtype=jnp.float32)
    env = SimpleEnvelope(basis="bspline", n_basis=4, omegas=(np.pi,))
    coeff = jnp.zeros((1, 4), jnp.float32)
    psi = cpx.from_complex(linalg.uniform_superposition(n), jnp.float32)
    with pytest.raises(ValueError, match="Pauli X/Y"):
        evolve_product_fused(ham, env, coeff, psi, 0.0, 1.0, horizon=1.0,
                             n_steps=4)
