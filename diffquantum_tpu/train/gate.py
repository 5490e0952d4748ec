"""Coherent target-unitary (gate) synthesis training.

The reference's only control objective is per-pair state-transfer fidelity
(`/root/reference/sim_plain.py:414-475`); synthesizing a *gate* with it
(|i> -> G|i> over the basis states, :func:`..models.control.
gate_synthesis_pairs`) is phase-blind — each column can converge to
``e^{i phi_i} G|i>`` with unmatched phases, which is not an implementation
of G. This trainer optimizes the coherent gate fidelity instead

    F(U) = |Tr(G^dag U(T))|^2 / d^2,     loss = 1 - F,

which is 1 iff U(T) = e^{i phi} G (global phase only). U(T) is never
materialized: the d basis states evolve as one batched propagator call and
the trace is the coherent sum of per-column overlaps
``Tr(G^dag U) = sum_i <G e_i | U e_i>``.

Gradients are adjoint-only (reverse mode through the batched checkpointed
scan): the coherent trace is not an expectation of any per-state observable,
so the reference's hardware-realistic MC estimator does not apply — use the
pair-based ``train_fidelity`` for the measurable (phase-blind) surrogate.

Epochs run as compiled ``lax.scan`` blocks exactly like ``train_energy`` /
``train_fidelity`` (one tunnel dispatch per ``epoch_block`` epochs).
"""
from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..dynamics.propagator import evolve, reference_n_steps
from ..ops import cpx
from ..ops.cpx import CP
from ..utils.logger import Logger, NullLogger
from .config import TrainConfig
from .energy import TrainResult, l2_grad, make_optimizer


def gate_infidelity(ham, envelope, coeff, gate_dag: CP, psi0_cols: CP,
                    T: float, n_steps: int, backend: str = "auto",
                    precision: str = "full", t_sample: str = "left"):
    """1 - |Tr(G^dag U(T))|^2 / d^2 with U(T) applied column-by-column as a
    batched evolution (no dense U is ever formed)."""
    d = psi0_cols.shape[-1]
    psi = evolve(ham, envelope, coeff, psi0_cols, 0.0, T, horizon=T,
                 n_steps=n_steps, backend=backend, precision=precision,
                 t_sample=t_sample)
    # row i of gate_dag is <G e_i|; overlap_i = (G^dag psi_i)_i = row_i . psi_i
    o_re = jnp.sum(gate_dag.re * psi.re - gate_dag.im * psi.im, axis=-1)
    o_im = jnp.sum(gate_dag.re * psi.im + gate_dag.im * psi.re, axis=-1)
    tr_re, tr_im = jnp.sum(o_re), jnp.sum(o_im)
    return 1.0 - (tr_re * tr_re + tr_im * tr_im) / (d * d)


def train_gate(
    ham,
    envelope,
    gate: np.ndarray,            # [d, d] complex target unitary
    T: float,
    config: TrainConfig,
    logger: Optional[Logger] = None,
    init_coeff: Optional[jnp.ndarray] = None,
) -> TrainResult:
    """Optimize spectral coefficients so the evolution implements ``gate``
    up to a global phase. Returns losses = per-epoch coherent infidelity;
    ``final_state`` holds the realized evolution as row-stacked kets (CP
    [d, d], ROW i = U|i>, i.e. final_state = U^T; transpose to get U —
    see demos/demo_control.py::run_gate)."""
    if config.grad_mode != "adjoint":
        raise ValueError("train_gate is adjoint-only (the coherent trace is "
                         "not a per-state observable); use train_fidelity "
                         "for the measurable pair-based surrogate")
    log = logger or NullLogger()
    log.write_text("!!!! train_gate ========")

    key = jax.random.PRNGKey(config.seed)
    key, k_init = jax.random.split(key)
    coeff = (envelope.init_coeff(k_init, scale=1.0, dtype=config.rdtype)
             if init_coeff is None else jnp.asarray(init_coeff, config.rdtype))

    g = np.asarray(gate, dtype=np.complex128)
    d = g.shape[0]
    if g.shape != (d, d) or not np.allclose(g @ g.conj().T, np.eye(d),
                                            atol=1e-8):
        raise ValueError("gate must be a square unitary matrix")
    # rows of G^dag indexed by input column i: (G^dag)_i. = conj(G)_. i ^T
    gate_dag = CP(jnp.asarray(g.conj().T.real, config.rdtype),
                  jnp.asarray(g.conj().T.imag, config.rdtype))
    psi0_cols = cpx.eye(d, dtype=config.rdtype)   # column i = |i>, batched

    opt = make_optimizer(config)
    opt_state = opt.init(coeff)
    n_steps = reference_n_steps(config.per_step, 0.0, T)
    T = float(T)
    backend = config.backend

    loss_fn = functools.partial(gate_infidelity, ham, envelope,
                                gate_dag=gate_dag, psi0_cols=psi0_cols,
                                T=T, n_steps=n_steps, backend=backend,
                                precision=config.precision,
                                t_sample=config.t_sample)

    def epoch_fn(carry, _):
        c, ost = carry
        loss, grad = jax.value_and_grad(loss_fn)(c)
        grad = grad + l2_grad(c, config.w_l2)
        updates, ost = opt.update(grad, ost, c)
        return (optax.apply_updates(c, updates), ost), loss

    @functools.partial(jax.jit, static_argnums=(1,))
    def run_block(carry, length):
        return jax.lax.scan(epoch_fn, carry, None, length=length)

    EPOCH_BLOCK = config.epoch_block if config.epoch_block is not None \
        else (50 if jax.default_backend() in ("tpu", "axon") else 1)

    losses = []
    t0 = time.time()
    carry = (coeff, opt_state)
    epoch = 0
    while epoch < config.n_epoch:
        blk = max(1, min(EPOCH_BLOCK, config.n_epoch - epoch))
        carry, losses_blk = run_block(carry, blk)
        for i, loss in enumerate(np.asarray(losses_blk)):
            e = epoch + 1 + i
            losses.append(float(loss))
            if e % config.log_every == 0:
                log.write_text(f"epoch: {e:04d}, loss_gate: {float(loss):.6f}")
                log.log_metrics(epoch=e, loss=float(loss), mode="adjoint")
        epoch += blk
    coeff, opt_state = carry

    finals = evolve(ham, envelope, coeff, psi0_cols, 0.0, T, horizon=T,
                    n_steps=n_steps, backend=backend,
                    precision=config.precision, t_sample=config.t_sample)
    return TrainResult(coeff=coeff, losses_energy=losses, losses_raw=losses,
                       final_state=finals, wall_s=time.time() - t0,
                       grad_mode="adjoint")
