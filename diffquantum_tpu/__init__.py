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


def _enable_compile_cache():
    """Persistent XLA compile cache for the WHOLE library, not just bench.py.

    Compile time — not runtime — is the binding constraint of this
    toolchain (a cold 24q hop-mega value+grad compiles in ~413 s;
    docs/PERFORMANCE.md): without a persistent cache every demo, test
    lane, and user training process pays the frontier compile again.
    Enabled at import (the reference's analogous fixed cost is scipy's
    per-call dense expm, `/root/reference/sim_plain.py:131-136`, which
    has no cache at all). Opt out with DQ_NO_COMPILE_CACHE=1; point the
    directory elsewhere with DQ_COMPILE_CACHE_DIR.
    """
    import os
    if os.environ.get("DQ_NO_COMPILE_CACHE"):
        return
    try:
        import jax
        cache_dir = os.environ.get("DQ_COMPILE_CACHE_DIR",
                                   "/tmp/diffquantum_tpu_jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # unknown flag on an old jax — cache is best-effort
        pass


_enable_compile_cache()

from .ops import cpx, linalg  # noqa: E402
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
