"""Multi-device tests on the virtual 8-device CPU mesh (conftest forces
--xla_force_host_platform_device_count=8) — the JAX-native analog of a fake
distributed backend (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np

from diffquantum_tpu.dynamics.product import evolve_product
from diffquantum_tpu.models import maxcut
from diffquantum_tpu.ops import cpx
from diffquantum_tpu.parallel.mesh import make_mesh, train_energy_seeds
from diffquantum_tpu.parallel.sharded_state import (
    evolve_product_sharded, sharded_diag_expectation)
from diffquantum_tpu.train import TrainConfig
import pytest

F64 = jnp.float64


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_product_matches_unsharded():
    # 5-qubit ring maxcut, state axis sharded over 4 devices (first 2 qubits
    # distributed → ppermute-based X rotations).
    n = 5
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4,
                               dtype=F64, dense=False)
    rng = np.random.default_rng(0)
    coeff = jnp.asarray(rng.standard_normal(prob.envelope.coeff_shape) * 0.4)
    n_steps = 30
    want = evolve_product(prob.ham, prob.envelope, coeff, prob.psi0, 0.0,
                          prob.T, horizon=prob.T, n_steps=n_steps)

    mesh = make_mesh({"state": 4})
    got = evolve_product_sharded(prob.ham, prob.envelope, coeff, prob.psi0,
                                 0.0, prob.T, horizon=prob.T,
                                 n_steps=n_steps, mesh=mesh)
    np.testing.assert_allclose(cpx.to_complex(got), cpx.to_complex(want),
                               atol=1e-10)

    e_sh = sharded_diag_expectation(got, prob.measurement.diag, mesh)
    e_ref = float(jnp.sum(cpx.abs2(want) * prob.measurement.diag))
    assert abs(float(e_sh) - e_ref) < 1e-10


def test_sharded_product_batched_two_axes():
    # batch of states sharded over "data", amplitudes over "state".
    n = 4
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4,
                               dtype=F64, dense=False)
    rng = np.random.default_rng(1)
    coeff = jnp.asarray(rng.standard_normal(prob.envelope.coeff_shape) * 0.3)
    batch = jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * 4), prob.psi0)
    mesh = make_mesh({"data": 4, "state": 2})
    got = evolve_product_sharded(prob.ham, prob.envelope, coeff, batch,
                                 0.0, prob.T, horizon=prob.T, n_steps=20,
                                 mesh=mesh, batch_axis="data")
    want = evolve_product(prob.ham, prob.envelope, coeff, batch, 0.0, prob.T,
                          horizon=prob.T, n_steps=20)
    np.testing.assert_allclose(cpx.to_complex(got), cpx.to_complex(want),
                               atol=1e-10)


@pytest.mark.slow
def test_sharded_evolution_differentiable():
    n = 4
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4,
                               dtype=F64, dense=False)
    rng = np.random.default_rng(2)
    coeff = jnp.asarray(rng.standard_normal(prob.envelope.coeff_shape) * 0.3)
    mesh = make_mesh({"state": 4})

    def loss(c):
        psi = evolve_product_sharded(prob.ham, prob.envelope, c, prob.psi0,
                                     0.0, prob.T, horizon=prob.T, n_steps=20,
                                     mesh=mesh)
        return sharded_diag_expectation(psi, prob.measurement.diag, mesh)

    def loss_ref(c):
        psi = evolve_product(prob.ham, prob.envelope, c, prob.psi0, 0.0,
                             prob.T, horizon=prob.T, n_steps=20)
        return jnp.sum(cpx.abs2(psi) * prob.measurement.diag)

    g = jax.grad(loss)(coeff)
    g_ref = jax.grad(loss_ref)(coeff)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-9)


def test_sharded_per_seed_coefficients():
    # dp x state: each seed has its OWN coefficients; sharded result must
    # match the per-seed vmapped unsharded product evolution.
    n = 4
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4,
                               dtype=F64, dense=False)
    rng = np.random.default_rng(5)
    n_seeds = 4
    coeffs = jnp.asarray(
        rng.standard_normal((n_seeds,) + prob.envelope.coeff_shape) * 0.3)
    batch = jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * n_seeds), prob.psi0)
    mesh = make_mesh({"data": 4, "state": 2})
    got = evolve_product_sharded(prob.ham, prob.envelope, coeffs, batch,
                                 0.0, prob.T, horizon=prob.T, n_steps=20,
                                 mesh=mesh, batch_axis="data")
    want = jax.vmap(lambda c, p: evolve_product(
        prob.ham, prob.envelope, c, p, 0.0, prob.T, horizon=prob.T,
        n_steps=20))(coeffs, batch)
    np.testing.assert_allclose(cpx.to_complex(got), cpx.to_complex(want),
                               atol=1e-10)


def test_train_energy_seeds_mc_mode():
    # hardware-realistic (MC) gradients, many seeds, one compiled scan
    prob = maxcut.demo_problem(dtype=F64)
    cfg = TrainConfig(n_basis=6, n_epoch=60, lr=5e-2, dtype="float64",
                      seed=0, grad_mode="mc", n_step=20)
    res = train_energy_seeds(prob.ham, prob.envelope, prob.measurement,
                             prob.psi0, prob.T, cfg, n_seeds=4)
    assert res.losses.shape == (60, 4)
    lam_min = float(np.min(prob.cost_diag))
    assert res.best_loss - lam_min < 1.0


@pytest.mark.slow
def test_train_energy_seeds_batched():
    prob = maxcut.demo_problem(dtype=F64)
    cfg = TrainConfig(n_basis=6, n_epoch=40, lr=5e-2, dtype="float64", seed=0)
    mesh = make_mesh({"data": 8})
    res = train_energy_seeds(prob.ham, prob.envelope, prob.measurement,
                             prob.psi0, prob.T, cfg, n_seeds=8, mesh=mesh)
    assert res.losses.shape == (40, 8)
    # every seed should make progress; the best should be close to optimal
    assert np.all(res.losses[-1] < res.losses[0])
    lam_min = float(np.min(prob.cost_diag))
    assert res.best_loss - lam_min < 0.5


@pytest.mark.slow
def test_train_energy_seeds_meshed_fused_kernel():
    """Meshed seed training with the batched fused kernel shard_mapped over
    the data axis (the round-1 mesh path silently fell back to XLA): must
    match the XLA product mesh path run with identical seeds."""
    n = 10
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4,
                               dense=False)
    mesh = make_mesh({"data": 4})
    kw = dict(n_seeds=8, mesh=mesh)
    cfg = TrainConfig(n_epoch=3, lr=5e-2, per_step=2, seed=7)
    res_f = train_energy_seeds(prob.ham, prob.envelope, prob.measurement,
                               prob.psi0, prob.T,
                               cfg.replace(backend="product_fused"), **kw)
    res_x = train_energy_seeds(prob.ham, prob.envelope, prob.measurement,
                               prob.psi0, prob.T,
                               cfg.replace(backend="product"), **kw)
    np.testing.assert_allclose(res_f.losses, res_x.losses, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(res_f.coeffs),
                               np.asarray(res_x.coeffs), rtol=1e-3,
                               atol=1e-5)


@pytest.mark.slow
def test_train_energy_seeds_meshed_fused_mc():
    """Round-3: the MC estimator (the paper's hardware-realistic mode) is
    shard_mapped over the data axis with the FUSED kernels inside — it
    previously degraded to the XLA product path under a mesh. Identical
    RNG streams ⇒ the meshed-fused run must match (a) the meshed XLA
    product run and (b) the single-device fused run."""
    n = 10
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4,
                               dense=False)
    mesh = make_mesh({"data": 4})
    cfg = TrainConfig(n_epoch=3, lr=5e-2, per_step=2, seed=11,
                      grad_mode="mc", n_step=8)
    res_f = train_energy_seeds(prob.ham, prob.envelope, prob.measurement,
                               prob.psi0, prob.T,
                               cfg.replace(backend="product_fused"),
                               n_seeds=8, mesh=mesh)
    res_x = train_energy_seeds(prob.ham, prob.envelope, prob.measurement,
                               prob.psi0, prob.T,
                               cfg.replace(backend="product"),
                               n_seeds=8, mesh=mesh)
    res_1 = train_energy_seeds(prob.ham, prob.envelope, prob.measurement,
                               prob.psi0, prob.T,
                               cfg.replace(backend="product_fused"),
                               n_seeds=8, mesh=None)
    np.testing.assert_allclose(res_f.losses, res_x.losses, rtol=1e-4,
                               atol=1e-5)
    # kernel-vs-XLA op ordering drifts coeffs at f32 roundoff, amplified
    # over epochs through the sigmoid chain — looser than the loss check
    np.testing.assert_allclose(np.asarray(res_f.coeffs),
                               np.asarray(res_x.coeffs), rtol=2e-2,
                               atol=3e-4)
    np.testing.assert_allclose(res_f.losses, res_1.losses, rtol=1e-4,
                               atol=1e-5)


def test_train_energy_seeds_mc_batch_samples():
    """config.mc_samples > 1 routes the seeds path through the
    variance-reduced batch estimator (stratified split times)."""
    prob = maxcut.demo_problem(dtype=F64)
    cfg = TrainConfig(n_basis=4, n_epoch=8, lr=5e-2, dtype="float64",
                      seed=0, grad_mode="mc", n_step=16, mc_samples=4,
                      mc_strategy="stratified")
    res = train_energy_seeds(prob.ham, prob.envelope, prob.measurement,
                             prob.psi0, prob.T, cfg, n_seeds=2)
    assert res.losses.shape == (8, 2)
    assert np.all(np.isfinite(res.losses))
    assert res.losses[-1].min() < res.losses[0].min()
