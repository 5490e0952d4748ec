"""MC gradient estimator on matrix-free (structured) problems."""
import jax
import jax.numpy as jnp
import numpy as np

from diffquantum_tpu.gradients.mc import mc_energy_grad
from diffquantum_tpu.models import maxcut
import pytest

F64 = jnp.float64


def test_mc_structured_matches_dense_same_key():
    # Same problem built dense and structured; force backend='product' on
    # both so the evolutions are identical — the only difference is the
    # dense-einsum vs structure-aware gate application. Same key → same
    # sampled s → identical gradients.
    n = 5
    graph = maxcut.ring_graph(n)
    dense = maxcut.build_maxcut(n, graph, n_basis=4, dtype=F64, dense=True)
    struct = maxcut.build_maxcut(n, graph, n_basis=4, dtype=F64, dense=False)
    rng = np.random.default_rng(0)
    coeff = jnp.asarray(rng.standard_normal(dense.envelope.coeff_shape) * 0.3)
    key = jax.random.PRNGKey(5)
    n_steps = 25

    g_dense = mc_energy_grad(dense.ham, dense.envelope, dense.measurement,
                             coeff, dense.psi0, dense.T, key, n_steps,
                             backend="product")
    g_struct = mc_energy_grad(struct.ham, struct.envelope,
                              struct.measurement, coeff, struct.psi0,
                              struct.T, key, n_steps, backend="product")
    np.testing.assert_allclose(np.asarray(g_struct), np.asarray(g_dense),
                               atol=1e-9)


@pytest.mark.slow
def test_mc_structured_14q_runs():
    n = 14
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4, dtype=F64)
    assert prob.ham.is_structured_only
    rng = np.random.default_rng(1)
    coeff = jnp.asarray(rng.standard_normal(prob.envelope.coeff_shape) * 0.2)
    g = mc_energy_grad(prob.ham, prob.envelope, prob.measurement, coeff,
                       prob.psi0, prob.T, jax.random.PRNGKey(0), 10)
    assert g.shape == coeff.shape
    assert np.all(np.isfinite(np.asarray(g)))


def test_mc_structured_sampling_noisy():
    n = 5
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4, dtype=F64,
                               dense=False, sampling=True, noisy=True)
    rng = np.random.default_rng(2)
    coeff = jnp.asarray(rng.standard_normal(prob.envelope.coeff_shape) * 0.3)
    g = mc_energy_grad(prob.ham, prob.envelope, prob.measurement, coeff,
                       prob.psi0, prob.T, jax.random.PRNGKey(1), 15,
                       sampling=True, noisy=True)
    assert np.all(np.isfinite(np.asarray(g)))


def test_mc_batch_map_matches_vmap_and_auto_routing():
    """sample_mode='map' (lax.map — required by the 18q+ packed kernels,
    whose ANY-space state buffers cannot be vmap-batched; chip-measured in
    tpu_tests::test_mc_estimator_18q_on_chip) must agree with 'vmap' to
    f32 reduction-order noise for every sampling strategy, and 'auto'
    must pick 'map' exactly at the packed-engine boundary (18 qubits)."""
    from diffquantum_tpu.dynamics.hamiltonian import (ControlledHamiltonian,
                                                      TermStructure)
    from diffquantum_tpu.gradients.mc import (_mc_sample_mode,
                                              mc_energy_grad_batch)
    from diffquantum_tpu.ops import linalg

    prob = maxcut.build_maxcut(6, maxcut.ring_graph(6), n_basis=4,
                               dense=False)
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.standard_normal(prob.envelope.coeff_shape),
                    jnp.float32) * 0.3
    key = jax.random.PRNGKey(3)
    for strat in ("iid", "antithetic", "stratified"):
        kw = dict(n_samples=4, strategy=strat)
        gv = mc_energy_grad_batch(prob.ham, prob.envelope, prob.measurement,
                                  c, prob.psi0, float(prob.T), key, 8,
                                  sample_mode="vmap", **kw)
        gm = mc_energy_grad_batch(prob.ham, prob.envelope, prob.measurement,
                                  c, prob.psi0, float(prob.T), key, 8,
                                  sample_mode="map", **kw)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(gm),
                                   rtol=2e-5, atol=5e-6)

    def ring_ham(n):
        structure = [TermStructure(kind="1q", qubit=q, local=linalg.X)
                     for q in range(n)]
        return ControlledHamiltonian.create_structured(
            2**n, tuple(structure),
            h0_structure=TermStructure(kind="diag", diag=np.zeros(2**n)),
            dtype=jnp.float32)

    assert _mc_sample_mode(ring_ham(17), "auto") == "vmap"
    assert _mc_sample_mode(ring_ham(18), "auto") == "map"
    assert _mc_sample_mode(ring_ham(18), "vmap") == "vmap"
