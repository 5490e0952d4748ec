"""Energy-minimization training (VQE / QAOA driver).

Rebuild of ``SimulatorPlain.train_energy`` (`/root/reference/
sim_plain.py:245-305`) and ``train_energy_FD`` (`sim_plain.py:355-412`) on
optax, with three gradient modes:

- ``adjoint``: exact reverse-mode gradient through the checkpointed
  propagator scan (new capability — the reference cannot do this);
- ``mc``: the paper's unbiased Monte-Carlo estimator (`sim_plain.py:290`,
  one sample per step; ``config.mc_samples`` averages several, vmapped);
- ``fd``: central finite differences (`sim_plain.py:398`).

Semantics kept from the reference:
- coefficient init ``N(0, 1e-3)`` (`sim_plain.py:259`);
- Adam with lr=2e-2 default (`sim_plain.py:266`);
- per-epoch reported quantity is the optimality gap
  ``loss - lambda_min(M)`` (`sim_plain.py:294`) — but we eigendecompose M
  once, not every epoch like the reference does;
- the measured loss honors `sampling_measure` / `is_noisy`
  (`sim_plain.py:278-284`).

Documented divergence: the reference's j^2-weighted L2 regularizer
(`sim_plain.py:285-289`) never reaches the optimizer — its autograd
gradient is overwritten by the estimator gradient at `sim_plain.py:291`.
Here ``w_l2 > 0`` genuinely regularizes (added analytically to the
estimator gradient); the default ``w_l2 = 0`` matches the reference's
effective behavior.
"""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..dynamics.propagator import evolve, reference_n_steps
from ..gradients.adjoint import energy_and_grad
from ..gradients.fd import fd_energy_grad
from ..gradients.mc import mc_energy_grad
from ..measure import Measurement
from ..utils.logger import Logger, NullLogger
from .config import TrainConfig


@dataclasses.dataclass
class TrainResult:
    coeff: jnp.ndarray
    losses_energy: list          # per-epoch optimality gaps (ref: losses_energy)
    losses_raw: list             # per-epoch measured loss values
    final_state: jnp.ndarray
    wall_s: float
    grad_mode: str


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    lr = config.lr
    if config.lr_schedule == "cosine":
        lr = optax.cosine_decay_schedule(config.lr, config.n_epoch,
                                         alpha=0.05)
    elif config.lr_schedule == "warmup_cosine":
        warm = max(1, config.n_epoch // 20)
        lr = optax.warmup_cosine_decay_schedule(
            0.0, config.lr, warm, config.n_epoch, end_value=0.05 * config.lr)
    elif config.lr_schedule != "constant":
        raise ValueError(f"unknown lr_schedule {config.lr_schedule!r}")
    if config.optimizer == "adam":
        return optax.adam(lr)
    if config.optimizer == "sgd":
        return optax.sgd(lr)
    raise ValueError(f"unknown optimizer {config.optimizer!r}")


def serialization_to_optstate(restored, template):
    """Rebuild an optax state pytree from its msgpack-restored plain
    containers using the freshly-initialized state as the structure
    template (msgpack flattens NamedTuples to dicts/lists)."""
    from flax import serialization
    return serialization.from_state_dict(template, restored) \
        if isinstance(restored, dict) else restored


def l2_grad(coeff: jnp.ndarray, w_l2: float) -> jnp.ndarray:
    """Gradient of the reference's j^2-weighted L2 term
    ``mean_j(mean_k c_kj^2 * j^2) * w_l2`` (`sim_plain.py:285-287`).

    The basis index is the LAST axis, so this also covers the 3-D channel
    coefficient tensor [2, n_idx, n_basis] (mean over all leading dims)."""
    if w_l2 == 0.0:
        return jnp.zeros_like(coeff)
    n_basis = coeff.shape[-1]
    j2 = jnp.arange(n_basis, dtype=coeff.dtype) ** 2
    return 2.0 * w_l2 * coeff * j2 / coeff.size


def train_energy(
    ham,
    envelope,
    measurement: Measurement,
    psi0: jnp.ndarray,
    T: float,
    config: TrainConfig,
    logger: Optional[Logger] = None,
    init_coeff: Optional[jnp.ndarray] = None,
    callback: Optional[Callable] = None,
    lam_min: Optional[float] = None,
) -> TrainResult:
    """Optimize spectral coefficients to minimize <psi(T)|M|psi(T)>."""
    log = logger or NullLogger()
    log.write_text("!!!! train_energy ========")
    log.log_config({f.name: getattr(config, f.name)
                    for f in dataclasses.fields(config)})

    key = jax.random.PRNGKey(config.seed)
    key, k_init = jax.random.split(key)
    coeff = (envelope.init_coeff(k_init, scale=1e-3, dtype=config.rdtype)
             if init_coeff is None else jnp.asarray(init_coeff, config.rdtype))

    opt = make_optimizer(config)
    opt_state = opt.init(coeff)
    start_epoch = 1

    # checkpoint/resume (absent in the reference — SURVEY.md §5)
    if config.checkpoint_dir:
        import os
        from ..utils.checkpointing import load_checkpoint
        if os.path.exists(os.path.join(config.checkpoint_dir, "ckpt.msgpack")):
            state = load_checkpoint(config.checkpoint_dir)
            coeff = jnp.asarray(state["coeff"], config.rdtype)
            opt_state = jax.tree_util.tree_map(
                jnp.asarray, serialization_to_optstate(state["opt_state"],
                                                       opt_state))
            key = jnp.asarray(state["key"])
            start_epoch = int(state["epoch"]) + 1
            log.write_text(f"resumed from epoch {start_epoch - 1}")

    n_steps = reference_n_steps(config.per_step, 0.0, T)
    mode = config.grad_mode
    T = float(T)

    # lambda_min(M): once, in numpy (the reference recomputes the full
    # spectrum every epoch, sim_plain.py:294).
    from ..ops import cpx
    if lam_min is not None:
        lam_min = float(lam_min)  # caller-supplied (e.g. free-fermion oracle)
    elif measurement.diag is not None:
        lam_min = float(np.min(np.asarray(measurement.diag)))
    elif measurement.matrix is not None:
        lam_min = float(
            np.linalg.eigvalsh(cpx.to_complex(measurement.matrix))[0])
    else:
        # matrix-free Pauli-sum / target objective with no caller hint:
        # report raw loss (gap == loss); exact lambda_min may be unknowable
        lam_min = 0.0

    meas_flags = dict(sampling=config.sampling_measure, noisy=config.is_noisy,
                      per_pauli=config.per_pauli)

    @jax.jit
    def measured_loss(c, k):
        psi = evolve(ham, envelope, c, psi0, 0.0, T, horizon=T,
                     n_steps=n_steps, backend=config.backend,
                     precision=config.precision,
                     t_sample=config.t_sample)
        m = dataclasses.replace(measurement, sampling=config.sampling_measure,
                                noisy=config.is_noisy,
                                per_pauli=config.per_pauli)
        return m.expectation(psi, key=k), psi

    def grad_fn(c, k):
        if mode == "adjoint":
            _, g = energy_and_grad(ham, envelope, measurement, c, psi0,
                                   T, n_steps, backend=config.backend,
                                   precision=config.precision,
                                   t_sample=config.t_sample)
            return g
        if mode == "mc":
            if config.mc_samples == 1:
                return mc_energy_grad(
                    ham, envelope, measurement, c, psi0, T, k, config.n_step,
                    backend=config.backend, chain=config.mc_chain,
                    precision=config.precision,
                    t_sample=config.t_sample, **meas_flags)
            keys = jax.random.split(k, config.mc_samples)
            gs = jax.vmap(lambda kk: mc_energy_grad(
                ham, envelope, measurement, c, psi0, T, kk, config.n_step,
                backend=config.backend, chain=config.mc_chain,
                precision=config.precision,
                t_sample=config.t_sample, **meas_flags))(keys)
            return gs.mean(axis=0)
        if mode == "fd":
            return fd_energy_grad(
                ham, envelope, measurement, c, psi0, T, k, config.n_step,
                backend=config.backend, delta=config.fd_delta,
                precision=config.precision,
                t_sample=config.t_sample, **meas_flags)
        raise ValueError(f"unknown grad_mode {mode!r}")

    @jax.jit
    def apply_update(c, g, opt_state):
        g = g.astype(c.dtype) + l2_grad(c, config.w_l2)
        updates, opt_state = opt.update(g, opt_state, c)
        return optax.apply_updates(c, updates), opt_state

    losses_gap, losses_raw = [], []
    final_state = None
    t0 = time.time()

    # --- hot loop: fixed-size compiled epoch blocks ---------------------
    # The reference's epoch loop (`sim_plain.py:269`) dispatches per epoch;
    # on the remote-TPU tunnel each dispatch costs 0.05-30 ms, so epochs run
    # as lax.scan blocks of EPOCH_BLOCK — one dispatch per block, HLO
    # independent of n_epoch (compile cache hits across runs). The RNG key
    # rides in the scan carry with the SAME split pattern as the per-epoch
    # path, so both modes produce bit-identical training runs. Logging and
    # checkpointing happen at block boundaries (losses are replayed
    # per-epoch from the scanned history; blocks are split so every
    # checkpoint_every multiple is a boundary). A per-epoch host callback
    # forces the legacy per-epoch loop; on CPU the default is per-epoch too
    # (no dispatch tax to amortize, and the block compile isn't free).
    # Block=50 on TPU: dispatching a kernel-bearing executable through the
    # remote tunnel costs a FIXED ~29 ms (docs/PERFORMANCE.md), so 50
    # epochs/dispatch bounds the leak at ~0.6 ms/epoch.
    if config.epoch_block is not None:
        EPOCH_BLOCK = config.epoch_block
    elif jax.default_backend() in ("tpu", "axon"):
        # a 50-epoch block at 2^20 amplitudes crashed the TPU worker in
        # round 2 — but only on the giant XLA-product mega-program; the
        # fused engines (VMEM/chunked kernels) run block=50 at 20 qubits
        # fine (measured round 3: 100 epochs, no crash). Keep the cap
        # only for big NON-fused problems.
        from ..dynamics.product import fused_eligible as _fe
        EPOCH_BLOCK = 10 if (ham.dim >= 2**20 and not _fe(ham)) else 50
    else:
        EPOCH_BLOCK = 1

    def epoch_fn(carry, _):
        c, ost, k = carry
        k, k_loss, k_grad = jax.random.split(k, 3)
        loss, _ = measured_loss(c, k_loss)
        g = grad_fn(c, k_grad)
        c, ost = apply_update(c, g, ost)
        return (c, ost, k), loss

    @functools.partial(jax.jit, static_argnums=(1,))
    def run_block(carry, length):
        return jax.lax.scan(epoch_fn, carry, None, length=length)

    def emit(epoch, loss):
        loss = float(loss)
        gap = loss - lam_min
        losses_raw.append(loss)
        losses_gap.append(gap)
        if epoch % config.log_every == 0:
            log.write_text(
                f"epoch: {epoch:04d}, loss: {loss}, loss_energy: {gap}")
            log.log_metrics(epoch=epoch, loss=loss, gap=gap, mode=mode)
        return gap

    ckpt_every = config.checkpoint_every if config.checkpoint_dir else 0

    def save_ckpt(epoch, c, ost, k):
        from ..utils.checkpointing import save_checkpoint
        save_checkpoint(config.checkpoint_dir,
                        dict(coeff=c, opt_state=ost, key=k, epoch=epoch))

    if callback is None and EPOCH_BLOCK > 1:
        carry = (coeff, opt_state, key)
        epoch = start_epoch - 1
        while epoch < config.n_epoch:
            blk = min(EPOCH_BLOCK, config.n_epoch - epoch)
            if ckpt_every:
                to_boundary = ckpt_every - epoch % ckpt_every
                blk = min(blk, to_boundary)
            carry, losses_b = run_block(carry, blk)
            for i, loss in enumerate(np.asarray(losses_b)):
                emit(epoch + 1 + i, loss)
            epoch += blk
            if ckpt_every and epoch % ckpt_every == 0:
                save_ckpt(epoch, *carry)
        coeff, opt_state, key = carry
        if config.n_epoch >= start_epoch:
            _, final_state = measured_loss(coeff, jax.random.PRNGKey(0))
    else:
        for epoch in range(start_epoch, config.n_epoch + 1):
            key, k_loss, k_grad = jax.random.split(key, 3)
            loss, _ = measured_loss(coeff, k_loss)
            grad = grad_fn(coeff, k_grad)
            coeff, opt_state = apply_update(coeff, grad, opt_state)
            gap = emit(epoch, loss)
            if callback is not None:
                callback(epoch=epoch, coeff=coeff, loss=float(loss), gap=gap)
            if ckpt_every and epoch % ckpt_every == 0:
                save_ckpt(epoch, coeff, opt_state, key)
        if config.n_epoch >= start_epoch:
            # state of the RETURNED coefficients (post-final-update) — same
            # convention as the block path; the reference keeps the
            # pre-update state (sim_plain.py:276), a documented divergence
            _, final_state = measured_loss(coeff, jax.random.PRNGKey(0))

    return TrainResult(coeff=coeff, losses_energy=losses_gap,
                       losses_raw=losses_raw, final_state=final_state,
                       wall_s=time.time() - t0, grad_mode=mode)


def train_energy_fd(ham, envelope, measurement, psi0, T, config: TrainConfig,
                    **kw) -> TrainResult:
    """The reference's FD baseline trainer (`sim_plain.py:355-412`)."""
    return train_energy(ham, envelope, measurement, psi0, T,
                        config.replace(grad_mode="fd"), **kw)
