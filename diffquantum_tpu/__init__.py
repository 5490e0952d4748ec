"""diffquantum_tpu — a TPU-native differentiable analog quantum computing
framework (JAX / XLA / Pallas), built from scratch with the capabilities of
YilingQiao/diffquantum (NeurIPS 2022, arXiv:2210.15812).

Simulates pulse-level dynamics ``H(t) = H0 + sum_k u_k(t; c) H_k`` with
trainable spectral pulse parameterizations and optimizes the coefficients
against quantum objectives with three gradient engines: reverse-mode adjoint
(`jax.grad` through a checkpointed scan), the paper's unbiased Monte-Carlo
estimator, and finite differences.

All complex arithmetic runs in the real-pair representation
(:class:`diffquantum_tpu.ops.cpx.CP`) — TPU hardware and Pallas are
real-valued; see ops/cpx.py.
"""
from .version import __version__

from .ops import cpx, linalg
from .ops.cpx import CP
from .ops.expm import (cexpm_apply_taylor, cexpm_pade13, cexpm_taylor,
                       taylor_params)
from .pulses.basis import basis_matrix
from .pulses.envelope import Channel, ChannelEnvelope, SimpleEnvelope
from .dynamics.hamiltonian import (ControlledHamiltonian, TermStructure,
                                   classify_operator, detect_structure)
from .dynamics.propagator import (calibrate_n_steps, evolve,
                                  evolve_trajectory, reference_n_steps,
                                  step_doubling_error, trotter)
from .dynamics.product import evolve_product, evolve_product_fused
from .measure import DiagonalTermSet, Measurement, PauliTermSet
from . import models, parallel, train, utils  # noqa: F401 (convenience)

__all__ = [
    "__version__",
    "cpx", "CP", "linalg",
    "cexpm_taylor", "cexpm_pade13", "cexpm_apply_taylor", "taylor_params",
    "basis_matrix",
    "SimpleEnvelope", "ChannelEnvelope", "Channel",
    "ControlledHamiltonian", "TermStructure",
    "classify_operator", "detect_structure",
    "evolve", "trotter", "reference_n_steps",
    "step_doubling_error", "calibrate_n_steps",
    "Measurement", "PauliTermSet",
]
