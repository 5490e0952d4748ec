"""Device-mesh utilities + seed-batched (data-parallel) training.

The reference trains ONE pulse initialization at a time on one CPU thread;
the natural TPU scale-out axis is *embarrassingly parallel seeds*: many
independent pulse initializations training simultaneously as one batched
program (BASELINE.md target: 64 parallel seeds for 12-qubit maxcut).

`train_energy_seeds` batches the full optimizer step over a leading seed
axis and shards that axis over a mesh ("data" parallelism over ICI); epochs
run as fixed-size compiled scan blocks — dispatch cost is amortized and the
compiled HLO is independent of n_epoch, so the persistent compile cache
hits across runs (whole-training scans paid a minutes-long remote compile
for every distinct epoch count).
"""
from __future__ import annotations

import functools
import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..dynamics.propagator import evolve, reference_n_steps
from ..measure import Measurement
from ..ops import cpx
from ..ops.cpx import CP
from ..train.config import TrainConfig
from ..train.energy import make_optimizer


def make_mesh(axes: dict[str, int], devices=None) -> Mesh:
    """Mesh over the available devices, e.g. ``make_mesh({"data": 4,
    "state": 2})``."""
    devices = jax.devices() if devices is None else devices
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, names)


@dataclasses.dataclass
class SeedsResult:
    coeffs: jnp.ndarray        # [n_seeds, ...] final coefficients
    losses: jnp.ndarray        # [n_epochs, n_seeds] measured loss history
    best_seed: int
    best_loss: float


def train_energy_seeds(
    ham,
    envelope,
    measurement: Measurement,
    psi0: CP,
    T: float,
    config: TrainConfig,
    n_seeds: int,
    mesh: Optional[Mesh] = None,
    data_axis: str = "data",
    init_scale: float = 1e-3,
) -> SeedsResult:
    """Train ``n_seeds`` independent pulse initializations in one batched,
    mesh-sharded program (adjoint gradients by default, ``grad_mode='mc'``
    for the hardware-realistic estimator). ``init_scale``: stddev of the
    coefficient init (the reference uses 1e-3 for energy training,
    `sim_plain.py:259`, and 1.0 for fidelity, `sim_plain.py:425`; noisy
    shot-sampled gradients benefit from a larger init that puts real
    slope under the estimator from epoch one)."""
    T = float(T)
    n_steps = reference_n_steps(config.per_step, 0.0, T)
    opt = make_optimizer(config)

    key = jax.random.PRNGKey(config.seed)
    keys = jax.random.split(key, n_seeds)
    coeffs = jax.vmap(lambda k: envelope.init_coeff(
        k, scale=init_scale, dtype=config.rdtype))(keys)

    if mesh is not None:
        spec = (data_axis,) + (None,) * (coeffs.ndim - 1)
        coeffs = jax.device_put(coeffs, NamedSharding(mesh, P(*spec)))

    # eligible structured problem → the batched fused Pallas kernel evolves
    # the seeds with the state resident in VMEM. Single-chip: ALL seeds in
    # one program. Meshed: a pallas_call is not auto-shardable, so the seed
    # axis is shard_mapped over the data axis and each device runs the
    # batched kernel on ITS seed shard (custom-VJP gradients flow through
    # shard_map — tests/test_sharded_fused.py).
    from ..dynamics.product import evolve_product_fused, fused_eligible
    fused_able = (config.backend in ("auto", "product_fused")
                  and fused_eligible(ham) and measurement.diag is not None)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    use_fused = fused_able and mesh is None \
        and (on_tpu or config.backend == "product_fused")
    use_fused_sharded = fused_able and mesh is not None \
        and (on_tpu or config.backend == "product_fused") \
        and n_seeds % mesh.shape[data_axis] == 0
    psi_batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_seeds,) + x.shape), psi0)

    if use_fused or use_fused_sharded:
        # slim away any dense operator payload: the fused kernel only needs
        # the structure metadata, and a closed-over dense stack would be
        # captured as jit constants (3.2 GB at 12 qubits — observed to make
        # remote compiles take ~40 minutes)
        from ..dynamics.hamiltonian import ControlledHamiltonian
        ham_f = ham if ham.is_structured_only else \
            ControlledHamiltonian.create_structured(
                ham.dim, ham.structure, h0_structure=ham.h0_structure,
                dtype=jnp.float32)

        if use_fused_sharded:
            from jax import shard_map

            def local_energies(cs_l, psi_re_l, psi_im_l, diag_r):
                psi = evolve_product_fused(
                    ham_f, envelope, cs_l, CP(psi_re_l, psi_im_l), 0.0, T,
                    horizon=T, n_steps=n_steps, precision=config.precision,
                    t_sample=config.t_sample)
                return jnp.sum(cpx.abs2(psi) * diag_r, axis=-1)

            cspec = P(*((data_axis,) + (None,) * (coeffs.ndim - 1)))

            def batch_energies(cs):
                return shard_map(
                    local_energies, mesh=mesh,
                    in_specs=(cspec, P(data_axis, None), P(data_axis, None),
                              P()),
                    out_specs=P(data_axis), check_vma=False,
                )(cs, psi_batch.re, psi_batch.im, measurement.diag)
        else:
            def batch_energies(cs):
                psi = evolve_product_fused(ham_f, envelope, cs, psi_batch,
                                           0.0, T, horizon=T,
                                           n_steps=n_steps,
                                           precision=config.precision,
                                           t_sample=config.t_sample)
                return jnp.sum(cpx.abs2(psi) * measurement.diag, axis=-1)
    else:
        def seed_energy(c, p):
            psi = evolve(ham, envelope, c, p, 0.0, T, horizon=T,
                         n_steps=n_steps, backend=config.backend,
                         precision=config.precision,
                         t_sample=config.t_sample)
            if measurement.diag is not None:
                return jnp.sum(cpx.abs2(psi) * measurement.diag, axis=-1)
            if measurement.strings is not None:
                return measurement.strings.expectation(psi)
            if measurement.target is not None:
                from ..measure import target_overlap_prob
                return target_overlap_prob(measurement.target, psi)
            from ..measure import exact_expectation
            return exact_expectation(measurement.matrix, psi)

        def batch_energies(cs):
            return jax.vmap(seed_energy)(cs, psi_batch)

    use_mc = config.grad_mode == "mc"
    if use_mc:
        from ..gradients.mc import mc_energy_grad

        mc_kw = dict(backend=config.backend, chain=config.mc_chain,
                     sampling=config.sampling_measure,
                     noisy=config.is_noisy, per_pauli=config.per_pauli,
                     precision=config.precision, t_sample=config.t_sample)

        def seed_mc_grad(c, p, k):
            if config.mc_samples > 1:
                # variance-reduced batch mode (stratified by default the
                # recommended setting, docs/PERFORMANCE.md) — essential
                # for the shot-sampled (hardware-realistic) mode where
                # single-sample gradients are noise-dominated
                from ..gradients.mc import mc_energy_grad_batch
                return mc_energy_grad_batch(
                    ham, envelope, measurement, c, p, T, k, config.n_step,
                    n_samples=config.mc_samples,
                    strategy=config.mc_strategy, **mc_kw)
            return mc_energy_grad(ham, envelope, measurement, c, p, T, k,
                                  config.n_step, **mc_kw)

        # Under a mesh, a pallas_call is not auto-shardable by GSPMD (a
        # vmapped estimator would replicate instead of partitioning), so
        # the hardware-realistic MC estimator gets the SAME shard_map
        # treatment as the adjoint energies: each device runs the (vmapped,
        # fused-kernel) estimator on ITS seed shard. Gradients are
        # per-seed outputs (no cross-seed terms), so out_specs shard
        # cleanly over the data axis.
        mc_sharded = (mesh is not None
                      and n_seeds % mesh.shape[data_axis] == 0)
        if mc_sharded:
            from jax import shard_map
            cspec = P(*((data_axis,) + (None,) * (coeffs.ndim - 1)))

            def _local_mc(cs_l, pre_l, pim_l, ks_l):
                return jax.vmap(lambda c, pr, pi, k: seed_mc_grad(
                    c, CP(pr, pi), k))(cs_l, pre_l, pim_l, ks_l)

            def batch_mc_grads(cs, ks):
                return shard_map(
                    _local_mc, mesh=mesh,
                    in_specs=(cspec, P(data_axis, None), P(data_axis, None),
                              P(data_axis)),
                    out_specs=cspec, check_vma=False,
                )(cs, psi_batch.re, psi_batch.im, ks)
        else:
            def batch_mc_grads(cs, ks):
                return jax.vmap(seed_mc_grad)(cs, psi_batch, ks)

    def one_step(cs, opt_state, key):
        # sum over seeds decouples: the gradient retains per-seed blocks,
        # and adam is elementwise so one optimizer over [B, ...] equals
        # B independent optimizers.
        if use_mc:
            energies = batch_energies(cs)
            keys = jax.random.split(key, n_seeds)
            g = batch_mc_grads(cs, keys).astype(cs.dtype)
        else:
            def total(c):
                e = batch_energies(c)
                return e.sum(), e

            (_, energies), g = jax.value_and_grad(total, has_aux=True)(cs)
        updates, opt_state = opt.update(g, opt_state, cs)
        return optax.apply_updates(cs, updates), opt_state, energies

    # Fixed-size compiled blocks: a whole-training scan would need a fresh
    # (minutes-long, remote) compile for every distinct n_epoch; scanning
    # EPOCH_BLOCK epochs per dispatch keeps the HLO epoch-count-independent
    # (compile cache hits across runs) while still amortizing the FIXED
    # ~29 ms per-dispatch cost of kernel-bearing executables on the remote
    # tunnel (docs/PERFORMANCE.md) to ~0.6 ms/epoch.
    if jax.default_backend() in ("tpu", "axon"):
        # scale the block down when the batched state reaches the size
        # that crashed the TPU worker on the giant XLA-product program
        # (2^20 amplitudes, round 2); the fused engines run block=50 at
        # that size fine (train/energy.py, measured round 3)
        EPOCH_BLOCK = 10 if (n_seeds * ham.dim >= 2**20
                             and not fused_eligible(ham)) else 50
        if use_mc and config.sampling_measure:
            # the sampled-MC epoch program is enormous (n_groups basis
            # rotations x 2 n_Hs branches x mc_samples); a 50-epoch
            # mega-block of it crashed the TPU worker (measured, H4 at
            # 2000 shots) — same failure class as the round-2 XLA-product
            # crash. Small blocks keep the compiled program bounded.
            EPOCH_BLOCK = min(EPOCH_BLOCK, 10)
    else:
        EPOCH_BLOCK = 10

    def epoch(carry, k):
        cs, oss = carry
        cs, oss, losses = one_step(cs, oss, k)
        return (cs, oss), losses

    @functools.partial(jax.jit, static_argnums=(2,))
    def run_block(carry, keys, length):
        return jax.lax.scan(epoch, carry, keys, length=length)

    key0 = jax.random.PRNGKey(config.seed + 1)
    all_keys = jax.random.split(key0, config.n_epoch)
    ctx = mesh if mesh is not None else _null_ctx()
    with ctx:
        carry = (coeffs, opt.init(coeffs))
        loss_blocks = []
        done = 0
        while done < config.n_epoch:
            blk = min(EPOCH_BLOCK, config.n_epoch - done)
            carry, losses_b = run_block(carry, all_keys[done:done + blk], blk)
            loss_blocks.append(losses_b)
            done += blk
        coeffs_out = carry[0]
        losses = jnp.concatenate(loss_blocks, axis=0)

    losses_np = np.asarray(losses)
    final = losses_np[-1]
    best = int(np.argmin(final))
    return SeedsResult(coeffs=coeffs_out, losses=losses_np, best_seed=best,
                       best_loss=float(final[best]))


class _null_ctx:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False
