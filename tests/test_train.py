"""End-to-end training: maxcut converges, VQE-H2 reaches chemical accuracy
region, control reaches high fidelity (SURVEY.md §4 oracle #5)."""
import jax.numpy as jnp
import numpy as np

from diffquantum_tpu.models import control, maxcut, vqe_h2
from diffquantum_tpu.train import TrainConfig, train_energy, train_fidelity
import pytest


def test_maxcut_demo_adjoint_converges():
    prob = maxcut.demo_problem(dtype=jnp.float64)
    cfg = TrainConfig(n_basis=6, n_epoch=60, lr=5e-2, grad_mode="adjoint",
                      dtype="float64", seed=0)
    res = train_energy(prob.ham, prob.envelope, prob.measurement, prob.psi0,
                       prob.T, cfg)
    # optimality gap should shrink decisively
    assert res.losses_energy[-1] < 0.25 * res.losses_energy[0]
    state, cut = prob.readout(res.final_state)
    assert cut == prob.max_cut  # ring of 4: max cut = 4


def test_maxcut_demo_mc_converges():
    prob = maxcut.demo_problem(dtype=jnp.float64)
    cfg = TrainConfig(n_basis=6, n_epoch=120, lr=2e-2, grad_mode="mc",
                      mc_samples=4, dtype="float64", seed=1, n_step=30)
    res = train_energy(prob.ham, prob.envelope, prob.measurement, prob.psi0,
                       prob.T, cfg)
    assert res.losses_energy[-1] < 0.5 * res.losses_energy[0]


def test_maxcut_fd_step_descends():
    # FD is O(n_Hs * n_basis) sims per step — run a few epochs only.
    prob = maxcut.demo_problem(dtype=jnp.float64, n_basis=3)
    cfg = TrainConfig(n_basis=3, n_epoch=8, lr=5e-2, grad_mode="fd",
                      dtype="float64", seed=2, n_step=20)
    res = train_energy(prob.ham, prob.envelope, prob.measurement, prob.psi0,
                       prob.T, cfg)
    assert res.losses_energy[-1] < res.losses_energy[0]


def test_vqe_h2_reaches_ground_state():
    prob = vqe_h2.build_h2(dtype=jnp.float64)
    cfg = TrainConfig(n_basis=6, n_epoch=250, lr=1e-1, grad_mode="adjoint",
                      dtype="float64", seed=0)
    res = train_energy(prob.ham, prob.envelope, prob.measurement, prob.psi0,
                       prob.T, cfg)
    final_energy = res.losses_raw[-1]
    # within 2 mHa of the exact ground energy (chemical accuracy ~1.6 mHa)
    assert final_energy - prob.exact_ground_energy < 2e-3, \
        (final_energy, prob.exact_ground_energy)


def test_state_transfer_fidelity():
    prob = control.state_transfer(n_qubits=1, T=2.0, dtype=jnp.float64)
    cfg = TrainConfig(n_basis=6, n_epoch=150, lr=1e-1, grad_mode="adjoint",
                      dtype="float64", seed=0)
    res = train_fidelity(prob.ham, prob.envelope, prob.initial_states,
                         prob.target_states, prob.T, cfg)
    assert res.losses_energy[-1] < 1e-3  # fidelity > 0.999


def test_fidelity_mc_mode_descends():
    prob = control.state_transfer(n_qubits=1, T=2.0, dtype=jnp.float64)
    cfg = TrainConfig(n_basis=6, n_epoch=60, lr=5e-2, grad_mode="mc",
                      dtype="float64", seed=3, n_step=25)
    res = train_fidelity(prob.ham, prob.envelope, prob.initial_states,
                         prob.target_states, prob.T, cfg)
    assert res.losses_energy[-1] < res.losses_energy[0]


def test_noisy_sampled_training_runs():
    prob = maxcut.demo_problem(dtype=jnp.float64, sampling=True, noisy=True)
    cfg = TrainConfig(n_basis=6, n_epoch=3, lr=2e-2, grad_mode="mc",
                      sampling_measure=True, is_noisy=True,
                      dtype="float64", seed=4, n_step=20)
    res = train_energy(prob.ham, prob.envelope, prob.measurement, prob.psi0,
                       prob.T, cfg)
    assert np.all(np.isfinite(res.losses_raw))


def test_checkpointing_roundtrip(tmp_path):
    import jax
    from diffquantum_tpu.utils.checkpointing import (load_checkpoint,
                                                     save_checkpoint)
    state = dict(coeff=jnp.ones((2, 3)), epoch=np.int64(7),
                 key=jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), state)
    back = load_checkpoint(str(tmp_path))
    np.testing.assert_allclose(np.asarray(back["coeff"]), 1.0)
    assert int(back["epoch"]) == 7


@pytest.mark.slow
def test_epoch_block_mode_bit_identical():
    """Compiled epoch blocks (one lax.scan dispatch per EPOCH_BLOCK epochs)
    must reproduce the per-epoch loop exactly — same RNG split pattern, same
    losses, same final coefficients."""
    import numpy as np
    from diffquantum_tpu.models import maxcut
    from diffquantum_tpu.train.config import TrainConfig
    from diffquantum_tpu.train.energy import train_energy

    prob = maxcut.build_maxcut(3, maxcut.ring_graph(3), n_basis=4,
                               dense=True, dtype=None or __import__(
                                   'jax.numpy', fromlist=['']).float64)
    kw = dict(n_epoch=7, lr=5e-2, grad_mode="mc", per_step=4, n_step=6,
              dtype="float64", sampling_measure=False, is_noisy=True)
    r_blk = train_energy(prob.ham, prob.envelope, prob.measurement,
                         prob.psi0, prob.T,
                         TrainConfig(epoch_block=3, **kw))
    r_leg = train_energy(prob.ham, prob.envelope, prob.measurement,
                         prob.psi0, prob.T,
                         TrainConfig(epoch_block=1, **kw))
    np.testing.assert_allclose(np.asarray(r_blk.losses_raw),
                               np.asarray(r_leg.losses_raw), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(r_blk.coeff),
                               np.asarray(r_leg.coeff), rtol=1e-10)


@pytest.mark.slow
def test_fidelity_epoch_block_bit_identical():
    """Compiled (epoch x pair) scan blocks in train_fidelity must reproduce
    the per-epoch loop exactly — per-pair optimizer stepping (reference
    sim_plain.py:459-464) and batch-mean mode, adjoint and MC."""
    prob = control.state_transfer(n_qubits=2, T=2.0, dtype=jnp.float64)
    # two pairs: |00>->|11> plus |11>->|00> so the per-pair scan is exercised
    import jax
    pairs = jax.tree_util.tree_map(
        lambda a, b: np.concatenate([a, b], axis=0),
        prob.initial_states, prob.target_states)
    targets = jax.tree_util.tree_map(
        lambda a, b: np.concatenate([a, b], axis=0),
        prob.target_states, prob.initial_states)
    for mode, per_pair in (("adjoint", True), ("mc", True), ("mc", False)):
        kw = dict(n_basis=4, n_epoch=5, lr=5e-2, grad_mode=mode,
                  dtype="float64", seed=3, n_step=8, is_noisy=(mode == "mc"))
        r_blk = train_fidelity(prob.ham, prob.envelope, pairs, targets,
                               prob.T, TrainConfig(epoch_block=2, **kw),
                               per_pair=per_pair)
        r_leg = train_fidelity(prob.ham, prob.envelope, pairs, targets,
                               prob.T, TrainConfig(epoch_block=1, **kw),
                               per_pair=per_pair)
        np.testing.assert_allclose(np.asarray(r_blk.losses_energy),
                                   np.asarray(r_leg.losses_energy),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(r_blk.coeff),
                                   np.asarray(r_leg.coeff), rtol=1e-10)


def test_train_gate_coherent_hadamard():
    """Coherent gate synthesis: loss 1 - |Tr(G^dag U)|^2/d^2 must drive the
    realized unitary to the target up to ONE global phase (the pair-based
    objective is phase-blind per column; this one is not)."""
    from diffquantum_tpu.ops import cpx
    from diffquantum_tpu.pulses.envelope import SimpleEnvelope
    from diffquantum_tpu.train import train_gate

    ham, omegas = control.single_qubit_controls(detuning=0.0,
                                                dtype=jnp.float64)
    env = SimpleEnvelope(basis="bspline", n_basis=6, omegas=omegas)
    h = np.array([[1, 1], [1, -1]]) / np.sqrt(2)
    cfg = TrainConfig(n_basis=6, n_epoch=200, lr=1e-1, grad_mode="adjoint",
                      dtype="float64", seed=0)
    res = train_gate(ham, env, h, T=2.0, config=cfg)
    assert res.losses_energy[-1] < 1e-5
    U = cpx.to_complex(res.final_state).T  # batch row i = U|i> -> columns
    tr = np.trace(h.conj().T @ U)
    phase = tr / abs(tr)
    assert np.abs(U - phase * h).max() < 5e-3


def test_train_gate_rejects_bad_inputs():
    import pytest
    from diffquantum_tpu.pulses.envelope import SimpleEnvelope
    from diffquantum_tpu.train import train_gate

    ham, omegas = control.single_qubit_controls(dtype=jnp.float64)
    env = SimpleEnvelope(basis="bspline", n_basis=4, omegas=omegas)
    cfg = TrainConfig(n_basis=4, n_epoch=1, dtype="float64")
    with pytest.raises(ValueError, match="unitary"):
        train_gate(ham, env, np.ones((2, 2)), T=1.0, config=cfg)
    with pytest.raises(ValueError, match="adjoint-only"):
        train_gate(ham, env, np.eye(2), T=1.0,
                   config=cfg.replace(grad_mode="mc"))


def test_lr_schedules():
    """Cosine / warmup-cosine schedules train and improve over constant on
    the demo problem at matched epochs (smoke + descent check)."""
    prob = maxcut.demo_problem(dtype=jnp.float64)
    for sched in ("cosine", "warmup_cosine"):
        cfg = TrainConfig(n_basis=6, n_epoch=60, lr=5e-2,
                          grad_mode="adjoint", dtype="float64",
                          lr_schedule=sched, seed=0)
        res = train_energy(prob.ham, prob.envelope, prob.measurement,
                           prob.psi0, prob.T, cfg)
        assert res.losses_energy[-1] < res.losses_energy[0] * 0.5, sched
    import pytest
    with pytest.raises(ValueError, match="lr_schedule"):
        from diffquantum_tpu.train.energy import make_optimizer
        make_optimizer(TrainConfig(lr_schedule="bogus"))


@pytest.mark.slow
def test_midpoint_training_beats_left_on_coarse_grid():
    """t_sample='mid' trains through all plumbing and, on a deliberately
    coarse grid, measures the final energy more accurately than the
    left-endpoint reference semantics (oracle: a fine-grid evaluation of
    the same trained pulse)."""
    from diffquantum_tpu.dynamics.propagator import evolve
    prob = maxcut.demo_problem(dtype=jnp.float64)
    cfg = TrainConfig(n_basis=6, n_epoch=40, lr=5e-2, grad_mode="adjoint",
                      dtype="float64", per_step=3, seed=0, t_sample="mid")
    res = train_energy(prob.ham, prob.envelope, prob.measurement, prob.psi0,
                       prob.T, cfg)
    assert res.losses_energy[-1] < res.losses_energy[0]
    # coarse-grid evaluation error vs a fine grid, mid vs left
    coeff = res.coeff
    fine = evolve(prob.ham, prob.envelope, coeff, prob.psi0, 0.0, prob.T,
                  horizon=prob.T, n_steps=2000, backend="expm")
    errs = {}
    for ts_mode in ("left", "mid"):
        coarse = evolve(prob.ham, prob.envelope, coeff, prob.psi0, 0.0,
                        prob.T, horizon=prob.T, n_steps=9, backend="expm",
                        t_sample=ts_mode)
        errs[ts_mode] = float(np.abs(
            np.asarray(coarse.re) - np.asarray(fine.re)).max()
            + np.abs(np.asarray(coarse.im) - np.asarray(fine.im)).max())
    assert errs["mid"] < errs["left"] / 3, errs
