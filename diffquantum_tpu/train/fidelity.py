"""Quantum optimal-control training: state-transfer fidelity maximization.

Rebuild of ``SimulatorPlain.train_fidelity`` (`/root/reference/
sim_plain.py:414-475`): a batch of (initial, target) state pairs; per pair
the objective is ``1 - <psi(T)| P_target |psi(T)>`` with the rank-1
projector ``P = |target><target|``, and the MC estimator is reused with
``coeff_sign = -1`` (`sim_plain.py:461`).

Modes:
- ``per_pair=True`` (reference semantics): one optimizer step per pair per
  epoch (`sim_plain.py:441-464`);
- ``per_pair=False`` (TPU-shaped): all pairs evolve as one vmapped batch and
  the gradient is the batch mean — one optimizer step per epoch.

Both modes run their epochs as compiled ``lax.scan`` blocks on TPU (one
dispatch per ``epoch_block`` epochs instead of 2-3 dispatches *per pair* per
epoch — the remote tunnel charges a fixed ~29 ms per kernel-bearing
dispatch, see docs/PERFORMANCE.md). The RNG key rides in the scan carry
with the same split pattern as the legacy per-epoch loop, so compiled and
per-epoch runs are bit-identical; ``config.epoch_block=1`` forces the
legacy loop (the CPU default).

Kept from the reference: coefficient init ``N(0, 1)`` (`sim_plain.py:425`,
note: *wider* than energy training's 1e-3). Adjoint mode supports exact
gradients of the batch-mean infidelity.
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
from ..gradients.adjoint import fidelity_and_grad
from ..gradients.mc import mc_energy_grad
from ..measure import Measurement
from ..ops import cpx
from ..ops.cpx import CP
from ..utils.logger import Logger, NullLogger
from .config import TrainConfig
from .energy import TrainResult, l2_grad, make_optimizer


def _projector(target: CP) -> CP:
    """|t><t| as CP: P_ij = t_i conj(t_j). Kept for dense cross-checks; the
    training path uses the matrix-free ``Measurement.create_target`` (one
    vdot per branch) so control training scales past 13 qubits."""
    re = jnp.outer(target.re, target.re) + jnp.outer(target.im, target.im)
    im = jnp.outer(target.im, target.re) - jnp.outer(target.re, target.im)
    return CP(re, im)


def train_fidelity(
    ham,
    envelope,
    initial_states: jnp.ndarray,   # [n_pairs, d]
    target_states: jnp.ndarray,    # [n_pairs, d]
    T: float,
    config: TrainConfig,
    logger: Optional[Logger] = None,
    per_pair: bool = True,
    init_coeff: Optional[jnp.ndarray] = None,
) -> TrainResult:
    log = logger or NullLogger()
    log.write_text("!!!! train_fidelity ========")

    key = jax.random.PRNGKey(config.seed)
    key, k_init = jax.random.split(key)
    coeff = (envelope.init_coeff(k_init, scale=1.0, dtype=config.rdtype)
             if init_coeff is None else jnp.asarray(init_coeff, config.rdtype))

    opt = make_optimizer(config)
    opt_state = opt.init(coeff)
    n_steps = reference_n_steps(config.per_step, 0.0, T)
    T = float(T)
    mode = config.grad_mode
    initial_states = initial_states.astype(config.rdtype)
    target_states = target_states.astype(config.rdtype)
    n_pairs = initial_states.shape[0]

    @jax.jit
    def pair_loss(c, psi0, target, k):
        psi = evolve(ham, envelope, c, psi0, 0.0, T, horizon=T,
                     n_steps=n_steps, backend=config.backend,
                     precision=config.precision,
                     t_sample=config.t_sample)
        if config.sampling_measure:
            # finite-shot projector measurement (Bernoulli trials on
            # |<t|psi>|^2) — the fidelity analog of sampled energy loss
            from ..measure import sampled_target_prob
            k, k_shot = jax.random.split(k)
            ov = sampled_target_prob(target, psi, k_shot, config.per_pauli)
        else:
            o = cpx.vdot(target, psi)
            ov = o.re * o.re + o.im * o.im
        if config.is_noisy:
            from ..measure import measurement_noise
            # reference adds noise to the inner product, sim_plain.py:452-454
            ov = measurement_noise(ov, k)
        return 1.0 - ov

    def pair_grad(c, psi0, target, k):
        if mode == "adjoint":
            _, g = fidelity_and_grad(ham, envelope, target, c, psi0, T,
                                     n_steps, backend=config.backend,
                                     precision=config.precision,
                                     t_sample=config.t_sample)
            return g
        if mode == "mc":
            # matrix-free |t><t|: <psi|M|psi> = |<t|psi>|^2, one vdot per
            # branch — works for structured (>13q) problems where the
            # reference's dense projector (`sim_plain.py:447`) cannot exist
            m = Measurement(matrix=None, target=target)
            return mc_energy_grad(
                ham, envelope, m, c, psi0, T, k, config.n_step,
                backend=config.backend, coeff_sign=-1.0,
                precision=config.precision,
                t_sample=config.t_sample,
                chain=config.mc_chain, noisy=config.is_noisy,
                sampling=config.sampling_measure,
                per_pauli=config.per_pauli)
        raise ValueError(f"grad_mode {mode!r} not supported for fidelity")

    @jax.jit
    def apply_update(c, g, opt_state):
        g = g.astype(c.dtype) + l2_grad(c, config.w_l2)
        updates, opt_state = opt.update(g, opt_state, c)
        return optax.apply_updates(c, updates), opt_state

    def epoch_fn(carry, _):
        """One epoch: per-pair scan (optimizer step per pair, reference
        `sim_plain.py:459-464`) or one batch-mean step. RNG split pattern
        matches the legacy per-epoch loop exactly."""
        c, ost, k = carry
        if per_pair:
            def pair_fn(pc, pair):
                c, ost, k = pc
                p, t = pair
                k, k_l, k_g = jax.random.split(k, 3)
                loss = pair_loss(c, p, t, k_l)
                g = pair_grad(c, p, t, k_g)
                c, ost = apply_update(c, g, ost)
                return (c, ost, k), loss
            (c, ost, k), losses_b = jax.lax.scan(
                pair_fn, (c, ost, k), (initial_states, target_states))
        else:
            k, k_l, k_g = jax.random.split(k, 3)
            kls = jax.random.split(k_l, n_pairs)
            kgs = jax.random.split(k_g, n_pairs)
            losses_b = jax.vmap(lambda p, t, kk: pair_loss(c, p, t, kk))(
                initial_states, target_states, kls)
            grads = jax.vmap(lambda p, t, kk: pair_grad(c, p, t, kk))(
                initial_states, target_states, kgs)
            c, ost = apply_update(c, grads.mean(axis=0), ost)
        return (c, ost, k), losses_b

    @functools.partial(jax.jit, static_argnums=(1,))
    def run_block(carry, length):
        return jax.lax.scan(epoch_fn, carry, None, length=length)

    EPOCH_BLOCK = config.epoch_block if config.epoch_block is not None \
        else (50 if jax.default_backend() in ("tpu", "axon") else 1)

    losses = []
    t0 = time.time()

    def emit(epoch, mean_loss):
        losses.append(mean_loss)
        if epoch % config.log_every == 0:
            log.write_text(
                f"epoch: {epoch:04d}, loss: {mean_loss:.4f}, "
                f"loss_fidelity: {mean_loss:.4f}")
            log.log_metrics(epoch=epoch, loss=mean_loss, mode=mode)

    if EPOCH_BLOCK > 1:
        carry = (coeff, opt_state, key)
        epoch = 0
        while epoch < config.n_epoch:
            blk = min(EPOCH_BLOCK, config.n_epoch - epoch)
            carry, losses_blk = run_block(carry, blk)   # [blk, n_pairs]
            for i, row in enumerate(np.asarray(losses_blk)):
                emit(epoch + 1 + i, float(row.mean()))
            epoch += blk
        coeff, opt_state, key = carry
    else:
        # legacy per-epoch loop (CPU default). Plain Python over pairs — the
        # pair scan above is only ever built inside the jitted block (an
        # eagerly dispatched nested scan of the checkpointed adjoint has
        # crashed XLA:CPU's compiler).
        for epoch in range(1, config.n_epoch + 1):
            batch_losses = []
            if per_pair:
                for i in range(n_pairs):
                    key, k_l, k_g = jax.random.split(key, 3)
                    loss = pair_loss(coeff, initial_states[i],
                                     target_states[i], k_l)
                    g = pair_grad(coeff, initial_states[i],
                                  target_states[i], k_g)
                    coeff, opt_state = apply_update(coeff, g, opt_state)
                    batch_losses.append(float(loss))
            else:
                key, k_l, k_g = jax.random.split(key, 3)
                kls = jax.random.split(k_l, n_pairs)
                kgs = jax.random.split(k_g, n_pairs)
                losses_b = jax.vmap(lambda p, t, k: pair_loss(coeff, p, t, k))(
                    initial_states, target_states, kls)
                grads = jax.vmap(lambda p, t, k: pair_grad(coeff, p, t, k))(
                    initial_states, target_states, kgs)
                coeff, opt_state = apply_update(coeff, grads.mean(axis=0),
                                                opt_state)
                batch_losses = [float(x) for x in losses_b]
            emit(epoch, sum(batch_losses) / len(batch_losses))

    # final states for all pairs
    finals = jax.vmap(lambda p: evolve(
        ham, envelope, coeff, p, 0.0, T, horizon=T, n_steps=n_steps,
        backend=config.backend, precision=config.precision,
        t_sample=config.t_sample))(initial_states)
    return TrainResult(coeff=coeff, losses_energy=losses, losses_raw=losses,
                       final_state=finals, wall_s=time.time() - t0,
                       grad_mode=mode)
