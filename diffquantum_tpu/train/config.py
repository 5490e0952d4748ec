"""Training configuration — an explicit dataclass.

The reference configures via constructor kwargs plus *implicit attribute
assignment after construction* (``sim.T``, ``sim.omegas``, ``sim.Pauli_M``
set from outside — `/root/reference/demo_maxcut.py:44,69-79,47-65`;
SURVEY.md §5 flags this as a contract to make explicit). All knobs live
here; reference kwargs keep their names (`sim_plain.py:20-22`).

Note: the reference accepts ``measure_sample_times`` but never reads it
(dead, SURVEY.md §5); we expose the working knob ``per_pauli`` (shots per
Pauli term; the reference hardcodes 100 at `sim_plain.py:101`).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # — reference-compatible knobs (sim_plain.py:20-22) —
    n_basis: int = 5
    basis: str = "bspline"
    n_epoch: int = 200
    lr: float = 2e-2
    is_noisy: bool = False
    sampling_measure: bool = False
    per_step: int = 10
    n_step: int = 100          # segment grid length used by MC/FD estimators

    # — new, TPU-native knobs —
    grad_mode: str = "adjoint"   # 'adjoint' | 'mc' | 'fd'
    backend: str = "auto"        # propagator backend
    t_sample: str = "left"      # envelope grid sampling: 'left'
                                 # (reference semantics, O(dt) vs true
                                 # dynamics) | 'mid' (midpoint, O(dt^2) at
                                 # identical cost; tests/test_ode_oracle)
    precision: str = "full"     # 'full' | 'fast': in-kernel matmul
                                 # precision of the fused TPU backend
                                 # ('fast' = single-pass bf16 MXU, ~25-40%
                                 # faster, amplitude error ~6e-5 over 30
                                 # steps; docs/PERFORMANCE.md)
    mc_samples: int = 1          # MC samples per optimizer step (ref: 1)
    mc_chain: str = "exact"      # 'exact' | 'reference' (sim_plain.py:224-230)
    mc_strategy: str = "iid"     # split-time sampling: 'iid' | 'antithetic'
                                 # | 'stratified' (variance at fixed cost)
    mc_t_jacobian: bool = False  # multiply by the U(0,T) Jacobian T (the
                                 # reference absorbs 1/T into the lr)
    fd_delta: float = 1e-3       # FD probe size (sim_plain.py:308)
    w_l2: float = 0.0            # j^2-weighted L2 (ref sets 0, sim_plain.py:263)
    per_pauli: int = 100         # shots per Pauli term (sim_plain.py:101)
    seed: int = 0
    dtype: str = "float32"       # REAL pair dtype: float32 on TPU,
                                 # float64 for high-precision CPU parity
    optimizer: str = "adam"      # optax optimizer name
    lr_schedule: str = "constant"  # 'constant' | 'cosine' | 'warmup_cosine'
                                 # (schedules span n_epoch optimizer steps;
                                 # per-pair fidelity mode steps n_pairs
                                 # times per epoch — scale n_epoch
                                 # accordingly if scheduling there)
    log_every: int = 1
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 0    # 0 = off
    epoch_block: Optional[int] = None  # epochs per compiled scan block in
                                 # train_energy; None = auto (10 on TPU where
                                 # dispatch latency dominates, 1 on CPU where
                                 # the block compile isn't worth it)

    @property
    def rdtype(self):
        return jnp.float64 if self.dtype in ("float64", "complex128") \
            else jnp.float32

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)
