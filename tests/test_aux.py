"""Auxiliary subsystems: profiling, checkpoint/resume, logger, plotting,
channel-envelope training, batched fidelity."""
import json
import os

import jax.numpy as jnp
import numpy as np

from diffquantum_tpu.models import control, maxcut
from diffquantum_tpu.train import TrainConfig, train_energy, train_fidelity
from diffquantum_tpu.utils.logger import Logger
from diffquantum_tpu.utils.profiling import timed, wall_timer
import pytest

F64 = jnp.float64


def test_timed_and_wall_timer(capsys):
    import jax

    f = jax.jit(lambda x: x * 2)
    stats = timed(f, jnp.ones(4), n_warmup=1, n_runs=3)
    assert stats["median_s"] > 0
    with wall_timer("block"):
        pass
    assert "[block]" in capsys.readouterr().out


def test_logger_metrics_jsonl(tmp_path):
    log = Logger(name="t", path=str(tmp_path), echo=False)
    log.write_text("hello")
    log.write_text_aux("aux-line")
    log.log_metrics(epoch=1, loss=0.5)
    assert "hello" in open(log.log_file).read()
    assert "aux-line" in open(log.log_file_aux).read()
    rec = json.loads(open(log.metrics_file).read().splitlines()[0])
    assert rec["epoch"] == 1 and rec["loss"] == 0.5 and "wall_s" in rec


def test_checkpoint_resume_continues_training(tmp_path):
    prob = maxcut.demo_problem(dtype=F64)
    ckdir = str(tmp_path / "ck")
    cfg = TrainConfig(n_basis=6, n_epoch=10, lr=5e-2, dtype="float64",
                      seed=0, checkpoint_dir=ckdir, checkpoint_every=5)
    res1 = train_energy(prob.ham, prob.envelope, prob.measurement, prob.psi0,
                        prob.T, cfg)
    assert os.path.exists(os.path.join(ckdir, "ckpt.msgpack"))

    # resume: run with a larger epoch budget; must pick up at epoch 11
    cfg2 = cfg.replace(n_epoch=15)
    res2 = train_energy(prob.ham, prob.envelope, prob.measurement, prob.psi0,
                        prob.T, cfg2)
    assert len(res2.losses_energy) == 5  # epochs 11..15 only
    assert res2.losses_energy[-1] <= res1.losses_energy[0]


def test_channel_envelope_adjoint_training():
    # carrier-modulated pulses are trainable end-to-end with the adjoint
    import numpy as np
    from diffquantum_tpu.dynamics.hamiltonian import ControlledHamiltonian
    from diffquantum_tpu.measure import Measurement
    from diffquantum_tpu.ops import cpx, linalg
    from diffquantum_tpu.pulses.envelope import ChannelEnvelope

    nested = [[[0.0, np.pi, 0.0, 0]], [[0.0, np.pi, 0.0, 1]]]
    env = ChannelEnvelope.from_rows(nested, n_basis=5, func_type=1)
    ham = ControlledHamiltonian.create(
        np.zeros((4, 4)), [linalg.pauli_string("XI"),
                           linalg.pauli_string("IX")], dtype=F64)
    # minimize <ZZ> from |00> (starts at +1, the maximum): the X drives must
    # learn to rotate toward anti-aligned states
    meas = Measurement.create(linalg.pauli_string("ZZ"), dtype=F64)
    psi0 = cpx.from_complex(linalg.basis_state(0, 4), F64)
    cfg = TrainConfig(n_basis=5, n_epoch=60, lr=1e-1, grad_mode="adjoint",
                      dtype="float64", seed=0)
    res = train_energy(ham, env, meas, psi0, 2.0, cfg)
    assert res.losses_raw[-1] < res.losses_raw[0] - 0.3


def test_fidelity_batched_mode():
    prob = control.hadamard_synthesis(dtype=F64)  # 2 pairs (gate synthesis)
    cfg = TrainConfig(n_basis=6, n_epoch=80, lr=1e-1, grad_mode="adjoint",
                      dtype="float64", seed=0)
    res = train_fidelity(prob.ham, prob.envelope, prob.initial_states,
                         prob.target_states, prob.T, cfg, per_pair=False)
    assert res.losses_energy[-1] < 0.01


@pytest.mark.slow
def test_long_chain_checkpointed_adjoint():
    # BASELINE.md stretch config (scaled to CPU test budget): long
    # propagator chain with checkpointed reverse-mode through the scan.
    import jax

    from diffquantum_tpu.dynamics.product import evolve_product
    from diffquantum_tpu.ops import cpx

    # 14 qubits / 300 steps keeps the CPU test budget sane while still
    # exercising the long checkpointed-scan reverse pass; bench.py covers
    # the full-size config on TPU.
    n = 14
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4)
    rng = np.random.default_rng(0)
    coeff = jnp.asarray(
        rng.standard_normal(prob.envelope.coeff_shape).astype(np.float32)
        * 0.1)
    n_steps = 300

    def loss(c):
        psi = evolve_product(prob.ham, prob.envelope, c, prob.psi0, 0.0,
                             prob.T, horizon=prob.T, n_steps=n_steps)
        return jnp.sum(cpx.abs2(psi) * prob.measurement.diag, axis=-1)

    val, g = jax.value_and_grad(loss)(coeff)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.abs(np.asarray(g)) > 0)


def test_l2_grad_channel_coeff_3d():
    """ADVICE r1: the j^2-weighted L2 must handle the 3-D ChannelEnvelope
    coefficient tensor [2, n_idx, n_basis], not just SimpleEnvelope's 2-D."""
    import jax.numpy as jnp
    import numpy as np
    from diffquantum_tpu.train.energy import l2_grad

    c3 = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 5)))
    g = l2_grad(c3, w_l2=0.7)
    j2 = np.arange(5) ** 2
    expect = 2.0 * 0.7 * np.asarray(c3) * j2 / c3.size
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-12)
    # 2-D unchanged semantics
    c2 = jnp.asarray(np.random.default_rng(1).standard_normal((4, 5)))
    g2 = l2_grad(c2, w_l2=0.3)
    expect2 = 2.0 * 0.3 * np.asarray(c2) * j2 / c2.size
    np.testing.assert_allclose(np.asarray(g2), expect2, rtol=1e-12)
