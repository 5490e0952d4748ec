"""Matrix-free objective coverage: FD gradients on diagonal measurements and
MC fidelity gradients on target-state (rank-1 projector) measurements —
both must work wherever training works (the reference's FD/fidelity paths
run on all its problems, `/root/reference/sim_plain.py:308-353,447-461`;
round-1 rebuild crashed on structured problems for both).
"""
import jax
import jax.numpy as jnp
import numpy as np

from diffquantum_tpu.gradients.adjoint import (energy_and_grad,
                                               fidelity_and_grad)
from diffquantum_tpu.gradients.fd import fd_energy_grad
from diffquantum_tpu.gradients.mc import mc_energy_grad
from diffquantum_tpu.measure import Measurement
from diffquantum_tpu.models import maxcut
from diffquantum_tpu.ops import cpx
from diffquantum_tpu.train.config import TrainConfig
from diffquantum_tpu.train.fidelity import _projector, train_fidelity
import pytest


def _structured_problem(n, dtype=jnp.float64, n_basis=4):
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=n_basis,
                               dense=False, dtype=dtype)
    rng = np.random.default_rng(3)
    coeff = jnp.asarray(
        rng.standard_normal(prob.envelope.coeff_shape), dtype=dtype) * 0.3
    return prob, coeff


def test_fd_on_structured_diagonal_measurement():
    """fd_energy_grad must honor Measurement.diag (matrix=None, the default
    beyond 8 qubits) — matches adjoint to FD truncation error."""
    prob, coeff = _structured_problem(6)
    assert prob.measurement.matrix is None and prob.measurement.diag is not None
    n_steps = 20
    key = jax.random.PRNGKey(0)
    g_fd = fd_energy_grad(prob.ham, prob.envelope, prob.measurement, coeff,
                          prob.psi0, float(prob.T), key, n_steps,
                          delta=1e-5)
    _, g_adj = energy_and_grad(prob.ham, prob.envelope, prob.measurement,
                               coeff, prob.psi0, float(prob.T), n_steps)
    np.testing.assert_allclose(np.asarray(g_fd), np.asarray(g_adj),
                               rtol=1e-4, atol=1e-7)


def test_fd_structured_sampling_path_runs():
    prob, coeff = _structured_problem(6)
    g = fd_energy_grad(prob.ham, prob.envelope, prob.measurement, coeff,
                       prob.psi0, float(prob.T), jax.random.PRNGKey(1),
                       12, sampling=True, noisy=True, per_pauli=8)
    assert g.shape == coeff.shape and bool(jnp.all(jnp.isfinite(g)))


def test_mc_target_measurement_equals_dense_projector():
    """Measurement(target=t) and Measurement(matrix=|t><t|) are the same
    objective — with the same PRNG key the MC gradient must agree to fp
    round-off (dense path exists at 6 qubits to compare against)."""
    prob, coeff = _structured_problem(6)
    d = prob.ham.dim
    rng = np.random.default_rng(11)
    t = rng.standard_normal(d) + 1j * rng.standard_normal(d)
    t /= np.linalg.norm(t)
    t_cp = cpx.from_complex(t, dtype=jnp.float64)
    key = jax.random.PRNGKey(5)
    kw = dict(coeff_sign=-1.0)
    g_free = mc_energy_grad(prob.ham, prob.envelope,
                            Measurement(matrix=None, target=t_cp),
                            coeff, prob.psi0, float(prob.T), key, 16, **kw)
    g_dense = mc_energy_grad(prob.ham, prob.envelope,
                             Measurement(matrix=_projector(t_cp)),
                             coeff, prob.psi0, float(prob.T), key, 16, **kw)
    np.testing.assert_allclose(np.asarray(g_free), np.asarray(g_dense),
                               rtol=1e-9, atol=1e-12)


@pytest.mark.slow
def test_mc_fidelity_estimator_unbiased_structured():
    """Mean of many MC fidelity-gradient samples approaches the adjoint
    gradient of |<t|psi(T)>|^2 (up to the absorbed 1/T Jacobian), on a
    structured problem with NO dense operators."""
    prob, coeff = _structured_problem(5)
    d = prob.ham.dim
    t = np.zeros(d, dtype=np.complex128)
    t[3] = 1.0
    t_cp = cpx.from_complex(t, dtype=jnp.float64)
    T = float(prob.T)
    n_steps = 16
    m = Measurement(matrix=None, target=t_cp)

    keys = jax.random.split(jax.random.PRNGKey(2), 256)
    grads = jax.vmap(lambda k: mc_energy_grad(
        prob.ham, prob.envelope, m, coeff, prob.psi0, T, k, n_steps,
        coeff_sign=-1.0))(keys)
    g_mc = np.asarray(grads.mean(axis=0)) * T  # undo the absorbed 1/T

    _, g_adj = fidelity_and_grad(prob.ham, prob.envelope, t_cp, coeff,
                                 prob.psi0, T, n_steps)
    g_adj = np.asarray(g_adj)
    # 256 samples → direction + coarse magnitude agreement
    cos = float(np.sum(g_mc * g_adj) /
                (np.linalg.norm(g_mc) * np.linalg.norm(g_adj)))
    assert cos > 0.95, (cos, g_mc, g_adj)


@pytest.mark.slow
def test_train_fidelity_mc_structured_14q():
    """Hardware-realistic control training beyond the dense-projector limit:
    14-qubit structured problem, MC gradients, matrix-free target."""
    n = 14
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4,
                               dense=False, dtype=jnp.float64)
    assert prob.ham.is_structured_only
    d = prob.ham.dim
    t = np.zeros(d, dtype=np.complex128)
    t[0] = 1.0
    pairs = cpx.from_complex(np.stack([np.full(d, d ** -0.5)]),
                             dtype=jnp.float64)
    targets = cpx.from_complex(np.stack([t]), dtype=jnp.float64)
    cfg = TrainConfig(n_epoch=3, lr=5e-2, grad_mode="mc", per_step=4,
                      n_step=8, dtype="float64")
    res = train_fidelity(prob.ham, prob.envelope, pairs, targets, prob.T,
                         cfg, per_pair=True)
    assert np.all(np.isfinite(res.losses_energy))
    assert np.all(np.isfinite(np.asarray(res.coeff)))
