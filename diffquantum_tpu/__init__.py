"""diffquantum_tpu — a TPU-native differentiable analog quantum computing
framework (JAX / XLA / Pallas), built from scratch with the capabilities of
YilingQiao/diffquantum (NeurIPS 2022, arXiv:2210.15812).

Simulates pulse-level dynamics ``H(t) = H0 + sum_k u_k(t; c) H_k`` with
trainable spectral pulse parameterizations and optimizes the coefficients
against quantum objectives with three gradient engines: reverse-mode adjoint
(`jax.grad` through a checkpointed scan), the paper's unbiased Monte-Carlo
estimator, and finite differences.
"""
from .version import __version__

from .ops import linalg
from .ops.expm import expm_taylor, expm_pade13, expm_hermitian, expm_apply_taylor
from .pulses.basis import basis_matrix
from .pulses.envelope import SimpleEnvelope, ChannelEnvelope, Channel
from .dynamics.hamiltonian import ControlledHamiltonian, TermStructure
from .dynamics.propagator import evolve, trotter, reference_n_steps

__all__ = [
    "__version__",
    "linalg",
    "expm_taylor", "expm_pade13", "expm_hermitian", "expm_apply_taylor",
    "basis_matrix",
    "SimpleEnvelope", "ChannelEnvelope", "Channel",
    "ControlledHamiltonian", "TermStructure",
    "evolve", "trotter", "reference_n_steps",
]
