"""Open-system (Lindblad) dynamics: master equation + quantum trajectories.

Beyond-reference capability. The reference models hardware imperfection
only as measurement noise (`/root/reference/sim_plain.py:207-208,452-454`);
its forward dynamics are always unitary (``qp.mesolve`` is called without
collapse operators, `sim_plain.py:330,386,448`). This module adds true
decoherence:

    drho/dt = -i [H(t), rho] + sum_k ( c_k rho c_k^dag
                                       - 1/2 {c_k^dag c_k, rho} )

with two TPU-shaped engines sharing the pulse/Hamiltonian stack:

1. :func:`evolve_lindblad` — density-matrix evolution. The superoperator is
   never materialized (it would be d^2 x d^2): each step applies
   ``exp(dt L)`` to rho by truncated-Taylor applications of the *matrix-free*
   Lindbladian — a handful of dense [d, d] x [d, d] real matmuls per term
   (MXU-shaped), scaling-and-squaring substeps chosen statically from a norm
   bound. Fully differentiable (checkpointed scan) — pulse optimization
   *under decoherence* works through ``jax.grad``.

2. :func:`evolve_mcwf` — Monte-Carlo wavefunction (quantum-jump) unraveling:
   per step, deterministic evolution under the non-Hermitian
   ``H_eff = H(t) - (i/2) sum_k c_k^dag c_k`` with renormalization, or a
   sampled jump ``psi -> c_k psi / ||.||`` with probability
   ``dt <psi|c_k^dag c_k|psi>`` (first-order unraveling; both branches are
   computed and selected — no data-dependent control flow under jit).
   Trajectories vmap over a key batch; the trajectory mean of any observable
   converges to the master-equation value at O(1/sqrt(n_traj)). State-sized
   memory — this is the engine that scales. Jumps are discrete events, so
   gradients through trajectories are NOT meaningful; train on
   :func:`evolve_lindblad` and evaluate/sample with trajectories.

All arithmetic is on CP real pairs (the TPU backend has no complex dtypes).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cpx
from ..ops.cpx import CP
from ..ops.expm import cexpm_apply_taylor, taylor_params
from .hamiltonian import ControlledHamiltonian, spectral_norm_bound
from .propagator import _amplitude_bound


@jax.tree_util.register_pytree_node_class
class CollapseSet:
    """Stacked collapse operators c_k (CP [m, d, d]) with static norm
    metadata and the precomputed Hermitian ``K = sum_k c_k^dag c_k``."""

    def __init__(self, ops: CP, k_op: CP, norms: tuple):
        self.ops = ops          # [m, d, d]
        self.k_op = k_op        # [d, d] = sum c^dag c
        self.norms = norms      # static per-op spectral norms

    @classmethod
    def create(cls, c_ops: Sequence, dtype=jnp.float32) -> "CollapseSet":
        mats = [np.asarray(c, dtype=np.complex128) for c in c_ops]
        if not mats:
            raise ValueError("CollapseSet needs at least one operator; use "
                             "the unitary engines for closed systems")
        stack = np.stack(mats)
        k = sum(c.conj().T @ c for c in mats)
        return cls(ops=cpx.from_complex(stack, dtype=dtype),
                   k_op=cpx.from_complex(k, dtype=dtype),
                   norms=tuple(spectral_norm_bound(c) for c in mats))

    @property
    def k_norm(self) -> float:
        return float(sum(n * n for n in self.norms))

    def tree_flatten(self):
        return (self.ops, self.k_op), (self.norms,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        ops, k_op = children
        return cls(ops=ops, k_op=k_op, norms=aux[0])


# ---------------------------------------------------------------------------
# standard single-qubit noise channels (embedded at site `qubit` of n)
def _embed(local: np.ndarray, qubit: int, n: int) -> np.ndarray:
    out = np.array([[1.0 + 0j]])
    for q in range(n):
        out = np.kron(out, local if q == qubit else np.eye(2))
    return out


def amplitude_damping(gamma: float, qubit: int, n: int) -> np.ndarray:
    """sqrt(gamma) |0><1| at `qubit` (T1 relaxation toward |0>)."""
    sm = np.array([[0.0, 1.0], [0.0, 0.0]])
    return np.sqrt(gamma) * _embed(sm, qubit, n)


def dephasing(gamma: float, qubit: int, n: int) -> np.ndarray:
    """sqrt(gamma/2) Z at `qubit` (pure dephasing, T2)."""
    z = np.diag([1.0, -1.0])
    return np.sqrt(gamma / 2.0) * _embed(z, qubit, n)


# ---------------------------------------------------------------------------
def _lindblad_apply(h_t: CP, c: CollapseSet, rho: CP) -> CP:
    """L[rho] = -i[H, rho] + sum_k c rho c^dag - 1/2 {K, rho}, matrix-free."""
    hr = cpx.matmul(h_t, rho)
    rh = cpx.matmul(rho, h_t)
    comm = cpx.mulmi(cpx.sub(hr, rh))            # -i [H, rho]
    # sum_k c_k rho c_k^dag: batched [m,d,d]x[d,d] then [m,d,d]x[m,d,d]
    crho = cpx.matmul(c.ops, CP(rho.re[None], rho.im[None]))
    crc = cpx.matmul(crho, cpx.dag(c.ops))       # [m, d, d]
    diss = CP(jnp.sum(crc.re, axis=0), jnp.sum(crc.im, axis=0))
    anti = cpx.rscale(cpx.add(cpx.matmul(c.k_op, rho),
                              cpx.matmul(rho, c.k_op)), 0.5)
    return cpx.add(comm, cpx.sub(diss, anti))


def lindblad_norm_bound(ham: ControlledHamiltonian, envelope,
                        c: CollapseSet) -> float:
    """Static bound on the superoperator norm: 2||H|| + 2 sum ||c_k||^2."""
    return 2.0 * ham.norm_bound(_amplitude_bound(envelope)) + 2.0 * c.k_norm


@functools.partial(
    jax.jit,
    static_argnames=("envelope", "horizon", "n_steps", "tol"))
def evolve_lindblad(
    ham: ControlledHamiltonian,
    envelope,
    coeff: jnp.ndarray,
    rho0: CP,                    # [d, d] density matrix
    c_ops: CollapseSet,
    T0,
    T,
    horizon: float,
    n_steps: int,
    tol: float = 1e-7,
) -> CP:
    """rho(T) by per-step ``exp(dt L)`` (truncated-Taylor applications of the
    matrix-free Lindbladian, statically substepped). Differentiable w.r.t.
    ``coeff`` through the checkpointed scan. Same left-endpoint grid
    semantics as the unitary :func:`..dynamics.propagator.evolve`."""
    if ham.is_structured_only:
        raise ValueError("evolve_lindblad needs dense operators (the "
                         "dissipator is a dense superoperator contraction); "
                         "build the problem with dense matrices")
    dt = (T - T0) / n_steps
    ts = T0 + dt * jnp.arange(n_steps, dtype=jnp.result_type(float))
    u = envelope.amplitudes(coeff, ts, horizon)   # [n_controls, n_steps]

    a_bound = (float(horizon) / n_steps) * lindblad_norm_bound(
        ham, envelope, c_ops)
    order, s = taylor_params(a_bound, tol)
    r = 2**s

    rho0 = rho0.astype(ham.dtype)
    u_steps = u.T.astype(ham.dtype)
    dt_c = jnp.asarray(dt, dtype=ham.dtype)

    @jax.checkpoint
    def step(rho, u_t):
        h_t = ham.at(u_t)
        zr = dt_c / r

        def substep(p, _):
            term, acc = p, p
            for k in range(1, order + 1):
                term = cpx.rscale(_lindblad_apply(h_t, c_ops, term), zr / k)
                acc = cpx.add(acc, term)
            return acc, None

        rho, _ = jax.lax.scan(substep, rho, None, length=r)
        return rho, None

    rho, _ = jax.lax.scan(step, rho0, u_steps)
    return rho


def expectation_rho(m, rho: CP) -> jnp.ndarray:
    """tr(M rho): real diagonal vector m, CP dense m, or a Measurement."""
    if isinstance(m, CP):
        prod = cpx.matmul(m, rho)
        return jnp.trace(prod.re)
    if hasattr(m, "diag") and hasattr(m, "matrix"):   # Measurement
        if m.diag is None:
            return expectation_rho(m.matrix, rho)
        return jnp.sum(jnp.asarray(m.diag, rho.re.dtype)
                       * jnp.diagonal(rho.re), axis=-1)
    return jnp.sum(jnp.asarray(m, rho.re.dtype) * jnp.diagonal(rho.re),
                   axis=-1)


def density_from_trajectories(psis: CP) -> CP:
    """Mean |psi><psi| over a trajectory batch CP [n_traj, d]."""
    n = psis.re.shape[0]
    re = (psis.re.T @ psis.re + psis.im.T @ psis.im) / n
    im = (psis.im.T @ psis.re - psis.re.T @ psis.im) / n
    return CP(re, im)


@functools.partial(
    jax.jit,
    static_argnames=("envelope", "horizon", "n_steps", "n_traj", "tol"))
def evolve_mcwf(
    ham: ControlledHamiltonian,
    envelope,
    coeff: jnp.ndarray,
    psi0: CP,                    # [d]
    c_ops: CollapseSet,
    T0,
    T,
    horizon: float,
    n_steps: int,
    key,
    n_traj: int,
    tol: float = 1e-7,
) -> CP:
    """CP [n_traj, d] of quantum-jump trajectory endpoints. The trajectory
    mean of <psi|M|psi> estimates tr(M rho(T)) to O(1/sqrt(n_traj)) +
    O(dt) unraveling bias (use the same grid as training; halving dt halves
    the bias)."""
    if ham.is_structured_only:
        raise ValueError("evolve_mcwf needs dense operators")
    dt = (T - T0) / n_steps
    ts = T0 + dt * jnp.arange(n_steps, dtype=jnp.result_type(float))
    u = envelope.amplitudes(coeff, ts, horizon)

    dt_bound = float(horizon) / n_steps
    heff_bound = dt_bound * (ham.norm_bound(_amplitude_bound(envelope))
                             + 0.5 * c_ops.k_norm)

    rdt = ham.dtype
    psi0 = psi0.astype(rdt)
    u_steps = u.T.astype(rdt)
    dt_c = jnp.asarray(dt, dtype=rdt)
    eps = jnp.asarray(1e-30, rdt)

    def one_trajectory(k0):
        def step(carry, u_t):
            psi, k = carry
            k, k_r, k_c = jax.random.split(k, 3)
            h_t = ham.at(u_t)
            # candidate jumps from the CURRENT state
            cpsi = cpx.matmul(c_ops.ops,
                              CP(psi.re[None, :, None], psi.im[None, :, None]))
            cpsi = CP(cpsi.re[..., 0], cpsi.im[..., 0])    # [m, d]
            w = dt_c * cpx.norm2(cpsi)                     # dp_k, [m]
            dp = jnp.sum(w)
            # deterministic branch: exp(dt (-i H - K/2)) psi, renormalized
            m_eff = cpx.add(cpx.mulmi(h_t), cpx.rscale(c_ops.k_op, -0.5))
            det = cexpm_apply_taylor(m_eff, psi, dt_c, jnp.zeros_like(dt_c),
                                     heff_bound, tol)
            det = cpx.rscale(det, jax.lax.rsqrt(cpx.norm2(det) + eps))
            # jump branch: k ~ w_k, psi -> c_k psi / ||.||
            idx = jax.random.categorical(k_c, jnp.log(w + eps))
            jump = CP(cpsi.re[idx], cpsi.im[idx])
            jump = cpx.rscale(jump, jax.lax.rsqrt(cpx.norm2(jump) + eps))
            take_jump = jax.random.uniform(k_r, dtype=rdt) < dp
            psi = CP(jnp.where(take_jump, jump.re, det.re),
                     jnp.where(take_jump, jump.im, det.im))
            return (psi, k), None

        (psi, _), _ = jax.lax.scan(step, (psi0, k0), u_steps)
        return psi

    keys = jax.random.split(key, n_traj)
    return jax.vmap(one_trajectory)(keys)
