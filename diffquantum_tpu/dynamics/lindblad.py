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
   *pathwise* gradients alone are biased; the structured engine therefore
   offers ``return_logp=True`` + :func:`score_surrogate` — a hybrid
   pathwise + score-function (REINFORCE, leave-one-out baseline) estimator
   that is unbiased for the gradient of the trajectory-ensemble objective.
   This is what makes T1-aware pulse training work past the d^2 memory of
   the density-matrix engines.

All arithmetic is on CP real pairs (the TPU backend has no complex dtypes).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cpx
from ..ops.fused_product import (diag_rows_device,
                                 diag_vec_device)
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
def amplitude_damping(gamma: float, qubit: int, n: int) -> np.ndarray:
    """sqrt(gamma) |0><1| at `qubit` (T1 relaxation toward |0>)."""
    from ..ops.linalg import op_on_qubits
    sm = np.array([[0.0, 1.0], [0.0, 0.0]])
    return np.sqrt(gamma) * op_on_qubits(sm, [qubit], n)


def dephasing(gamma: float, qubit: int, n: int) -> np.ndarray:
    """sqrt(gamma/2) Z at `qubit` (pure dephasing, T2)."""
    from ..ops.linalg import op_on_qubits
    z = np.diag([1.0, -1.0])
    return np.sqrt(gamma / 2.0) * op_on_qubits(z, [qubit], n)


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
    static_argnames=("envelope", "horizon", "n_steps", "tol", "t_sample"))
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
    t_sample: str = "left",
) -> CP:
    """rho(T) by per-step ``exp(dt L)`` (truncated-Taylor applications of the
    matrix-free Lindbladian, statically substepped). Differentiable w.r.t.
    ``coeff`` through the checkpointed scan. Same left-endpoint grid
    semantics as the unitary :func:`..dynamics.propagator.evolve`."""
    if ham.is_structured_only:
        raise ValueError("evolve_lindblad needs dense operators (the "
                         "dissipator is a dense superoperator contraction); "
                         "build the problem with dense matrices")
    from .propagator import time_grid
    dt = (T - T0) / n_steps
    ts = time_grid(T0, dt, n_steps, t_sample)
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
    """tr(M rho): real diagonal vector m, CP dense m, or a Measurement
    (diagonal / dense / Pauli-string / target forms all supported)."""
    if isinstance(m, CP):
        prod = cpx.matmul(m, rho)
        return jnp.trace(prod.re)
    if hasattr(m, "diag") and hasattr(m, "matrix"):   # Measurement
        if m.diag is not None:
            return jnp.sum(jnp.asarray(m.diag, rho.re.dtype)
                           * jnp.diagonal(rho.re), axis=-1)
        if getattr(m, "strings", None) is not None:
            return strings_expectation_rho(m.strings, rho)
        if getattr(m, "target", None) is not None:
            # tr(|t><t| rho) = <t| rho |t>
            rt = cpx.matvec(rho, m.target)
            o = cpx.vdot(m.target, rt)
            return o.re
        if m.matrix is None:
            raise ValueError("Measurement has no operator form usable on a "
                             "density matrix")
        return expectation_rho(m.matrix, rho)
    return jnp.sum(jnp.asarray(m, rho.re.dtype) * jnp.diagonal(rho.re),
                   axis=-1)


def strings_expectation_rho(strings, rho: CP) -> jnp.ndarray:
    """sum_t w_t tr(P_t rho), matrix-free: tr(P rho) =
    sum_k f(k xor m) rho[k xor m, k] with the signed-permutation form of
    each string (P|l> = f(l)|l xor m>) — so open-system expectation of any
    Pauli-sum cost (TFIM, molecules) needs one gather per term."""
    from ..measure import _bit_parity
    d = 2**strings.n_qubits
    j = jnp.arange(d, dtype=jnp.int32)
    total = 0.0
    for t in range(strings.n_terms):
        jp = j ^ jnp.int32(strings.flips[t])
        s = (1.0 - 2.0 * _bit_parity(jp & jnp.int32(strings.yz_masks[t]))
             ).astype(rho.re.dtype)
        # rho[jp, j] gathered along rows
        g_re = jnp.sum(s * rho.re[jp, j])
        g_im = jnp.sum(s * rho.im[jp, j])
        e = (g_re, -g_im, -g_re, g_im)[strings.n_ys[t] % 4]
        total = total + strings.weights[t] * e
    return total


def density_from_trajectories(psis: CP) -> CP:
    """Mean |psi><psi| over a trajectory batch CP [n_traj, d]."""
    n = psis.re.shape[0]
    re = (psis.re.T @ psis.re + psis.im.T @ psis.im) / n
    im = (psis.im.T @ psis.re - psis.re.T @ psis.im) / n
    return CP(re, im)


def score_surrogate(values: jnp.ndarray, logps: jnp.ndarray) -> jnp.ndarray:
    """Surrogate scalar for trajectory-ensemble objectives whose VALUE is
    exactly ``mean(values)`` and whose GRADIENT is the unbiased hybrid
    pathwise + score-function estimator

        d/dth E[L] = E[ dL/dth |_outcomes  +  (L - b) d log P(outcomes)/dth ]

    with a leave-one-out baseline ``b_i = mean_{j != i} L_j`` (keeps the
    estimator unbiased — a batch-mean baseline correlates with its own
    sample — while cancelling most of the score variance).

    values: [n_traj] per-trajectory losses, differentiable in the pulse
    parameters (the pathwise part); logps: [n_traj] from
    ``evolve_mcwf_structured(..., return_logp=True)``. Feed the result to
    ``jax.grad`` (or any optax trainer) like an ordinary loss."""
    n = values.shape[0]
    v_sg = jax.lax.stop_gradient(values)
    if n > 1:
        baseline = (jnp.sum(v_sg) - v_sg) / (n - 1)
    else:
        baseline = jnp.zeros_like(v_sg)
    # (logps - stop_grad(logps)) is 0 in value, d(logps)/dth in gradient
    score = (v_sg - baseline) * (logps - jax.lax.stop_gradient(logps))
    return jnp.mean(values + score)


@jax.tree_util.register_pytree_node_class
class StructuredNoise:
    """Per-qubit noise channels for STRUCTURED (matrix-free) trajectories:
    amplitude damping (T1, ``c_q = sqrt(g1) |0><1|_q``) and pure dephasing
    (``c_q = sqrt(gphi/2) Z_q``). For these channels ``K = sum c^dag c`` is
    DIAGONAL — ``sum_q g1_q n_q + sum_q gphi_q/2`` — so the non-Hermitian
    part of H_eff folds into the Strang phase block as a real decay, and
    every jump is a masked gather / sign flip: O(2^n) memory, any size."""

    def __init__(self, n_qubits: int, t1=(), dephasing=()):
        """t1 / dephasing: sequences of (qubit, gamma)."""
        self.n_qubits = int(n_qubits)
        self.t1 = tuple((int(q), float(g)) for q, g in t1)
        self.dephasing = tuple((int(q), float(g)) for q, g in dephasing)
        if not self.t1 and not self.dephasing:
            raise ValueError("StructuredNoise needs at least one channel")

    def tree_flatten(self):
        return (), (self.n_qubits, self.t1, self.dephasing)

    @classmethod
    def tree_unflatten(cls, aux, children):
        n, t1, deph = aux
        return cls(n, t1, deph)

    def k_diag(self) -> np.ndarray:
        """Diagonal of K = sum_k c_k^dag c_k (length 2^n, host numpy)."""
        d = 2**self.n_qubits
        j = np.arange(d)
        out = np.zeros(d)
        for q, g in self.t1:
            bit = 1 << (self.n_qubits - 1 - q)
            out += g * ((j & bit) > 0)
        for _, g in self.dephasing:
            out += 0.5 * g
        return out

    @property
    def k_norm(self) -> float:
        return float(np.max(self.k_diag())) if 2**self.n_qubits else 0.0

    def dense_collapse_ops(self):
        """Dense c_k list (for small-n oracle cross-checks)."""
        return ([amplitude_damping(g, q, self.n_qubits)
                 for q, g in self.t1]
                + [dephasing(g, q, self.n_qubits)
                   for q, g in self.dephasing])


def _rho_phase(rho: CP, theta: jnp.ndarray) -> CP:
    """rho <- diag(e^{-i th}) rho diag(e^{+i th}): elementwise multiply by
    e^{-i (th_i - th_j)} (broadcast row/col angle difference)."""
    dth = theta[:, None] - theta[None, :]
    c, s = jnp.cos(dth), jnp.sin(dth)
    return CP(c * rho.re + s * rho.im, c * rho.im - s * rho.re)


def _apply_axis(rho: CP, m_re, m_im, qubit: int, n: int, axis: int) -> CP:
    """Contract a 2x2 complex matrix with the ``qubit`` tensor slot of the
    row (axis=0) or column (axis=1) index of rho [d, d]:
    axis=0: y[i,:] = sum_b M[a_i, b] rho[b,:];  axis=1: y[:,j] = sum_b
    rho[:,b] M[b, a_j]."""
    d = rho.re.shape[0]
    left, right = 2**qubit, 2 ** (n - qubit - 1)
    if axis == 0:
        shape = (left, 2, right, d)
        pat = "ab,lbrj->larj"
    else:
        shape = (d, left, 2, right)
        pat = "ba,ilbr->ilar"
    rr = rho.re.reshape(shape)
    ri = rho.im.reshape(shape)
    hp = jax.lax.Precision.HIGHEST
    re = jnp.einsum(pat, m_re, rr, precision=hp) \
        - jnp.einsum(pat, m_im, ri, precision=hp)
    im = jnp.einsum(pat, m_re, ri, precision=hp) \
        + jnp.einsum(pat, m_im, rr, precision=hp)
    return CP(re.reshape(d, d), im.reshape(d, d))


def _rho_1q_rot(rho: CP, theta, qubit: int, n: int, g_re, g_im) -> CP:
    """rho <- U rho U^dag with U = exp(-i th G), G involutory Hermitian:
    U = cos th I - i sin th G."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    eye = jnp.eye(2, dtype=rho.re.dtype)
    u_re = c * eye + s * g_im          # Re(cI - isG) = cI + s Im(G)
    u_im = -s * g_re
    # U rho (rows), then rho U^dag (cols): (U^dag)_re = U_re^T,
    # (U^dag)_im = -U_im^T
    rho = _apply_axis(rho, u_re, u_im, qubit, n, axis=0)
    return _apply_axis(rho, u_re.T, -u_im.T, qubit, n, axis=1)


def _channel_half(rho: CP, noise: "StructuredNoise", tau, j_idx, rdt) -> CP:
    """Exact per-qubit noise channels applied for time ``tau``:

    - pure dephasing (c = sqrt(g/2) Z): coherences with differing qubit
      bit decay by e^{-g tau} — one elementwise mask multiply;
    - amplitude damping (c = sqrt(g) |0><1|): the exact Kraus map — scale
      by eta^{(row bit)+(col bit)} (eta = e^{-g tau / 2}) plus the
      population transfer rho[i0,j0] += (1 - eta^2) rho[i1,j1] (a masked
      double gather).

    Channels on distinct qubits commute exactly; everything is O(d^2)
    elementwise — no operators materialized, so the Hamiltonian can stay
    fully structured."""
    n = noise.n_qubits
    re, im = rho.re, rho.im
    for q, g in noise.dephasing:
        bit = 1 << (n - 1 - q)
        b = (j_idx & bit) > 0
        f = jnp.where(b[:, None] ^ b[None, :],
                      jnp.exp(jnp.asarray(-g, rdt) * tau), 1.0).astype(rdt)
        re = re * f
        im = im * f
    for q, g in noise.t1:
        bit = 1 << (n - 1 - q)
        b = (j_idx & bit) > 0
        eta = jnp.exp(-0.5 * jnp.asarray(g, rdt) * tau)
        s_row = jnp.where(b, eta, 1.0).astype(rdt)
        f = s_row[:, None] * s_row[None, :]
        src = j_idx | jnp.int32(bit)
        keep = (~b[:, None]) & (~b[None, :])
        tr_re = jnp.take(jnp.take(re, src, axis=0), src, axis=1)
        tr_im = jnp.take(jnp.take(im, src, axis=0), src, axis=1)
        gain = (1.0 - eta * eta)
        re = re * f + jnp.where(keep, gain * tr_re, 0.0)
        im = im * f + jnp.where(keep, gain * tr_im, 0.0)
    return CP(re, im)


@functools.partial(
    jax.jit,
    static_argnames=("envelope", "horizon", "n_steps", "t_sample"))
def evolve_lindblad_structured(
    ham,                         # structured ControlledHamiltonian
    envelope,
    coeff: jnp.ndarray,
    rho0: CP,                    # [d, d]
    noise: "StructuredNoise",
    T0,
    T,
    horizon: float,
    n_steps: int,
    t_sample: str = "left",
) -> CP:
    """Differentiable master-equation evolution for STRUCTURED problems:
    Strang split of the Lindbladian into (exact per-qubit channel maps,
    half time) x (structured unitary step, two-sided) x (channel maps,
    half time) — O(dt^3) local error like the closed-system product
    engine, O(d^2) state memory and O(n d^2) elementwise work per step,
    and NO dense operators anywhere. This is what removes the
    dense-operator ceiling of :func:`evolve_lindblad` from the noise-aware
    training path: 14-qubit pulse optimization under decoherence
    differentiates through the checkpointed scan (the remaining limit is
    rho's own d^2 memory, not operator storage)."""
    from .product import split_structure
    n = ham.n_qubits
    (diag_idx, diag_rows, h0_diag, oneq_idx, oneq_qubits,
     oneq_locals) = split_structure(
        ham, hop_msg="evolve_lindblad_structured does not support 'hop' "
        "(XX+YY) terms yet")
    if noise.n_qubits != n:
        raise ValueError("noise qubit count mismatch")

    from .propagator import time_grid
    dt = (T - T0) / n_steps
    ts = time_grid(T0, dt, n_steps, t_sample)
    u = envelope.amplitudes(coeff, ts, horizon)
    rdt = ham.dtype

    diag_table = diag_rows_device(diag_rows, ham.dim, rdt)
    h0_vec = diag_vec_device(h0_diag, rdt)
    u_diag = (u[jnp.asarray(diag_idx, jnp.int32)] if diag_idx else
              jnp.zeros((0, n_steps))).astype(rdt)
    u_oneq = (u[jnp.asarray(oneq_idx, jnp.int32)] if oneq_idx else
              jnp.zeros((0, n_steps))).astype(rdt)
    locals_re = [jnp.asarray(np.asarray(g).real, dtype=rdt)
                 for g in oneq_locals]
    locals_im = [jnp.asarray(np.asarray(g).imag, dtype=rdt)
                 for g in oneq_locals]
    dt_c = jnp.asarray(dt, rdt)
    j_idx = jnp.arange(ham.dim, dtype=jnp.int32)

    palindromic = len(set(oneq_qubits)) < len(oneq_qubits)
    m = len(oneq_qubits)
    order = list(range(m)) + list(reversed(range(m))) if palindromic \
        else list(range(m))
    frac = 0.5 * dt_c if palindromic else dt_c

    @jax.checkpoint
    def step(rho, xs):
        ud, uq = xs
        rho = _channel_half(rho, noise, 0.5 * dt_c, j_idx, rdt)
        theta_half = (0.5 * dt_c) * (h0_vec + jnp.matmul(
            ud, diag_table, precision=jax.lax.Precision.HIGHEST))
        rho = _rho_phase(rho, theta_half)
        for i in order:
            rho = _rho_1q_rot(rho, frac * uq[i], oneq_qubits[i], n,
                              locals_re[i], locals_im[i])
        rho = _rho_phase(rho, theta_half)
        rho = _channel_half(rho, noise, 0.5 * dt_c, j_idx, rdt)
        return rho, None

    rho, _ = jax.lax.scan(step, rho0.astype(rdt), (u_diag.T, u_oneq.T))
    return rho


@functools.partial(
    jax.jit,
    static_argnames=("envelope", "horizon", "n_steps", "n_traj",
                     "t_sample"))
def evolve_dephasing_trajectories(
    ham,                         # structured ControlledHamiltonian
    envelope,
    coeff: jnp.ndarray,
    psi0: CP,                    # [d]
    noise: "StructuredNoise",
    T0,
    T,
    horizon: float,
    n_steps: int,
    key,
    n_traj: int,
    t_sample: str = "left",
) -> CP:
    """Pure-dephasing open dynamics as an ensemble of UNITARY trajectories
    with random Z phases — exact in distribution and fully differentiable.

    A dephasing channel (c = sqrt(g/2) Z_q) equals classical Gaussian
    phase noise: applying exp(-i a Z_q) with a ~ N(0, g dt / 2) each step
    decays coherences by exactly e^{-g dt} in expectation, for ANY dt (the
    Gaussian composes). Because the noise does not depend on the pulse
    coefficients, gradients are pathwise (reparameterized): grad of the
    trajectory-mean loss is an UNBIASED estimate of the Lindblad-loss
    gradient — noise-aware training at O(n_traj 2^n) memory, any size the
    closed-system engine reaches (vs d^2 for the density matrix). T1
    channels cannot be unraveled this way (use
    :func:`evolve_lindblad_structured` or the non-differentiable MCWF).

    Returns CP [n_traj, d] endpoint states."""
    from .product import apply_1q_pauli_rot, split_structure
    if noise.t1:
        raise ValueError(
            "random-phase unraveling covers pure dephasing only; T1 "
            "channels need evolve_lindblad_structured (differentiable) or "
            "evolve_mcwf_structured (sampling)")
    n = ham.n_qubits
    (diag_idx, diag_rows, h0_diag, oneq_idx, oneq_qubits,
     oneq_locals) = split_structure(
        ham, hop_msg="the dephasing-trajectory engine does not support "
        "'hop' (XX+YY) terms yet")
    if noise.n_qubits != n:
        raise ValueError("noise qubit count mismatch")

    from .propagator import time_grid
    dt = (T - T0) / n_steps
    ts = time_grid(T0, dt, n_steps, t_sample)
    u = envelope.amplitudes(coeff, ts, horizon)
    rdt = ham.dtype

    diag_table = diag_rows_device(diag_rows, ham.dim, rdt)
    h0_vec = diag_vec_device(h0_diag, rdt)
    u_diag = (u[jnp.asarray(diag_idx, jnp.int32)] if diag_idx else
              jnp.zeros((0, n_steps))).astype(rdt)
    u_oneq = (u[jnp.asarray(oneq_idx, jnp.int32)] if oneq_idx else
              jnp.zeros((0, n_steps))).astype(rdt)
    locals_re = [jnp.asarray(np.asarray(g).real, dtype=rdt)
                 for g in oneq_locals]
    locals_im = [jnp.asarray(np.asarray(g).imag, dtype=rdt)
                 for g in oneq_locals]
    dt_c = jnp.asarray(dt, rdt)

    # per-channel Z diagonals (+/-1 vectors) and noise std per step
    d = ham.dim
    j_idx = np.arange(d)
    z_rows = []
    gammas = []
    for q, g in noise.dephasing:
        bit = 1 << (n - 1 - q)
        z_rows.append(1.0 - 2.0 * ((j_idx & bit) > 0))
        gammas.append(g)
    z_table = jnp.asarray(np.stack(z_rows), rdt)        # [n_ch, d]
    # a ~ N(0, g dt / 2) — dt may be traced (T is a regular arg)
    sig = jnp.sqrt(jnp.asarray(gammas, rdt) * jnp.abs(dt_c) / 2.0)

    palindromic = len(set(oneq_qubits)) < len(oneq_qubits)
    m = len(oneq_qubits)
    order = list(range(m)) + list(reversed(range(m))) if palindromic \
        else list(range(m))
    frac = 0.5 * dt_c if palindromic else dt_c

    # pre-draw all phase kicks: [n_traj, n_steps, n_ch]
    xi = jax.random.normal(key, (n_traj, n_steps, len(gammas)), dtype=rdt)
    alphas = xi * sig

    def one_trajectory(alpha_t):
        @jax.checkpoint
        def step(psi, xs):
            ud, uq, al = xs
            theta_half = (0.5 * dt_c) * (h0_vec + jnp.matmul(
                ud, diag_table, precision=jax.lax.Precision.HIGHEST)) \
                + 0.5 * jnp.matmul(al, z_table,
                                   precision=jax.lax.Precision.HIGHEST)
            ph = CP(jnp.cos(theta_half), -jnp.sin(theta_half))
            psi = cpx.mul(ph, psi)
            for i in order:
                psi = apply_1q_pauli_rot(psi, frac * uq[i], oneq_qubits[i],
                                         n, locals_re[i], locals_im[i])
            psi = cpx.mul(ph, psi)
            return psi, None

        psi, _ = jax.lax.scan(step, psi0.astype(rdt),
                              (u_diag.T, u_oneq.T, alpha_t))
        return psi

    return jax.vmap(one_trajectory)(alphas)


@functools.partial(
    jax.jit,
    static_argnames=("envelope", "horizon", "n_steps", "n_traj",
                     "t_sample", "return_logp", "backend"))
def evolve_mcwf_structured(
    ham,                         # structured ControlledHamiltonian
    envelope,
    coeff: jnp.ndarray,
    psi0: CP,                    # [d]
    noise: StructuredNoise,
    T0,
    T,
    horizon: float,
    n_steps: int,
    key,
    n_traj: int,
    t_sample: str = "left",
    return_logp: bool = False,
    backend: str = "xla",
) -> CP:
    """Quantum-jump trajectories on the product-formula engine — the
    scalable open-system path (the dense :func:`evolve_mcwf` caps out with
    the dense operators at ~13 qubits).

    Per step: Strang split of ``exp(dt(-i H(t) - K/2))`` where the
    (diagonal) decay K/2 rides INSIDE the exact diagonal phase block
    (diagonals commute, so adding the decay costs one elementwise exp), 1q
    rotations between the half phases; then the standard first-order jump
    decision. Jump application: amplitude damping = masked XOR gather,
    dephasing = parity sign flip — both matrix-free.

    ``return_logp=True`` additionally returns each trajectory's
    differentiable log-likelihood ``log P(outcomes; coeff)`` (sum over
    steps of ``log w_k`` for the chosen jump / ``log(1 - dp)`` for
    no-jump). Combined with :func:`score_surrogate` this yields an
    UNBIASED gradient of the ensemble-averaged objective — the pathwise
    part differentiates the trajectory map with outcomes held fixed, the
    score part accounts for the coeff-dependence of the jump measure.

    ``backend='fused'`` (round 4) runs all trajectories LOCKSTEP through
    one batched Pallas rotation block per step
    (:func:`..ops.fused_product.fused_rot_block`) instead of the per-op
    XLA rotations — the on-chip path for 16q+ noise-aware training
    (Pauli X/Y drive sets; same math, same per-trajectory key chain as
    the XLA path, so trajectories match draw for draw)."""
    from .product import apply_1q_pauli_rot, split_structure
    if backend not in ("xla", "fused"):
        raise ValueError(f"backend must be 'xla' or 'fused', "
                         f"got {backend!r}")

    n = ham.n_qubits
    (diag_idx, diag_rows, h0_diag, oneq_idx, oneq_qubits,
     oneq_locals) = split_structure(
        ham, hop_msg="the structured MCWF/trajectory engine does not "
        "support 'hop' (XX+YY) terms yet")
    if noise.n_qubits != n:
        raise ValueError("noise qubit count mismatch")

    from .propagator import time_grid
    dt = (T - T0) / n_steps
    ts = time_grid(T0, dt, n_steps, t_sample)
    u = envelope.amplitudes(coeff, ts, horizon)
    rdt = ham.dtype

    diag_table = diag_rows_device(diag_rows, ham.dim, rdt)
    h0_vec = diag_vec_device(h0_diag, rdt)
    u_diag = (u[jnp.asarray(diag_idx, jnp.int32)] if diag_idx else
              jnp.zeros((0, n_steps))).astype(rdt)
    u_oneq = (u[jnp.asarray(oneq_idx, jnp.int32)] if oneq_idx else
              jnp.zeros((0, n_steps))).astype(rdt)
    locals_re = [jnp.asarray(g.real, dtype=rdt) for g in oneq_locals]
    locals_im = [jnp.asarray(g.imag, dtype=rdt) for g in oneq_locals]
    dt_c = jnp.asarray(dt, rdt)
    kd = jnp.asarray(noise.k_diag(), rdt)
    decay_half = jnp.exp(-0.25 * dt_c * kd)   # exp(-dt K / 2) split in two

    d = ham.dim
    j_idx = jnp.arange(d, dtype=jnp.int32)
    # per-T1-channel masks and lowered-index gathers
    t1_bits = [1 << (n - 1 - q) for q, _ in noise.t1]
    t1_gammas = jnp.asarray([g for _, g in noise.t1], rdt) \
        if noise.t1 else jnp.zeros((0,), rdt)
    deph_bits = [1 << (n - 1 - q) for q, _ in noise.dephasing]
    deph_gammas = jnp.asarray([g for _, g in noise.dephasing], rdt) \
        if noise.dephasing else jnp.zeros((0,), rdt)
    n_t1, n_deph = len(t1_bits), len(deph_bits)
    eps = jnp.asarray(1e-30, rdt)
    # jump-candidate norm floor: keeps rsqrt and its DERIVATIVE finite in
    # the working dtype (a candidate this small has selection weight
    # w ~ dt*gamma*floor and is never drawn)
    cand_floor = jnp.asarray(1e-24 if rdt == jnp.float32 else 1e-30, rdt)

    palindromic = len(set(oneq_qubits)) < len(oneq_qubits)
    m = len(oneq_qubits)
    order = list(range(m)) + list(reversed(range(m))) if palindromic \
        else list(range(m))
    frac = 0.5 * dt_c if palindromic else dt_c

    def det_step(psi, ud, uq):
        theta_half = (0.5 * dt_c) * (
            h0_vec + jnp.matmul(ud, diag_table,
                                precision=jax.lax.Precision.HIGHEST))
        ph_re = jnp.cos(theta_half) * decay_half
        ph_im = -jnp.sin(theta_half) * decay_half
        psi = cpx.mul(CP(ph_re, ph_im), psi)
        for i in order:
            psi = apply_1q_pauli_rot(psi, frac * uq[i], oneq_qubits[i], n,
                                     locals_re[i], locals_im[i])
        return cpx.mul(CP(ph_re, ph_im), psi)

    if backend == "fused":
        from .product import _pauli_kind, _symmetrize_rots
        from ..ops.fused_product import fused_rot_block
        kinds = tuple(_pauli_kind(g) for g in oneq_locals)
        if any(kd is None for kd in kinds):
            raise ValueError(
                "backend='fused' needs Pauli X/Y 1q drives; use "
                "backend='xla' for general involutory generators")
        qubits_t, kinds_t, theta_tbl = _symmetrize_rots(
            list(oneq_qubits), kinds, dt_c * u_oneq.T, axis=1)

        def det_step_b(psi_b, ud, th_row):
            theta_half = (0.5 * dt_c) * (
                h0_vec + jnp.matmul(ud, diag_table,
                                    precision=jax.lax.Precision.HIGHEST))
            ph = CP(jnp.cos(theta_half) * decay_half,
                    -jnp.sin(theta_half) * decay_half)
            psi_b = cpx.mul(ph, psi_b)  # [d] broadcasts over [B, d]
            if theta_tbl.shape[1]:
                th_b = jnp.broadcast_to(th_row[None],
                                        (n_traj, th_row.shape[0]))
                psi_b = fused_rot_block(psi_b, th_b, tuple(qubits_t), n,
                                        kinds_t)
            return cpx.mul(ph, psi_b)

        def step_b(carry, xs):
            psi, ks, logp = carry  # CP [B, d], keys [B], logp [B]
            ud, uq, th_row = xs
            trip = jax.vmap(lambda kk: jax.random.split(kk, 3))(ks)
            ks_n, k_r, k_c = trip[:, 0], trip[:, 1], trip[:, 2]
            p2 = cpx.abs2(psi)  # [B, d]
            ws = []
            for bi, bit in enumerate(t1_bits):
                occ = jnp.sum(jnp.where((j_idx & bit) > 0, p2, 0.0),
                              axis=-1)
                ws.append(dt_c * t1_gammas[bi] * occ)
            for di in range(n_deph):
                ws.append(dt_c * 0.5 * deph_gammas[di]
                          * jnp.sum(p2, axis=-1))
            w = jnp.stack(ws, axis=-1) if ws else \
                jnp.zeros((n_traj, 0), rdt)
            dp = jnp.sum(w, axis=-1)  # [B]

            det = det_step_b(psi, ud, th_row)
            det = cpx.rscale(det, jax.lax.rsqrt(cpx.norm2(det)
                                                + eps)[:, None])

            cand_re, cand_im = [], []
            for bit in t1_bits:
                src = j_idx | jnp.int32(bit)
                keep = (j_idx & bit) == 0
                jr = jnp.where(keep, jnp.take(psi.re, src, axis=-1), 0.0)
                ji = jnp.where(keep, jnp.take(psi.im, src, axis=-1), 0.0)
                s2 = jnp.maximum(jnp.sum(jr * jr + ji * ji, axis=-1),
                                 cand_floor)
                nrm = jax.lax.rsqrt(s2)[:, None]
                cand_re.append(jr * nrm)
                cand_im.append(ji * nrm)
            for bit in deph_bits:
                sgn = jnp.where((j_idx & bit) > 0, -1.0, 1.0).astype(rdt)
                cand_re.append(psi.re * sgn)
                cand_im.append(psi.im * sgn)
            if cand_re:
                cre = jnp.stack(cand_re, axis=1)  # [B, n_ch, d]
                cim = jnp.stack(cand_im, axis=1)
                idx = jax.vmap(jax.random.categorical)(
                    k_c, jnp.log(w + eps))  # [B]
                jump_re = jnp.take_along_axis(
                    cre, idx[:, None, None], axis=1)[:, 0]
                jump_im = jnp.take_along_axis(
                    cim, idx[:, None, None], axis=1)[:, 0]
                chosen_logw = jnp.log(
                    jnp.take_along_axis(w, idx[:, None], axis=1)[:, 0]
                    + eps)
            else:
                jump_re, jump_im = det.re, det.im
                chosen_logw = jnp.zeros((n_traj,), rdt)
            take = jax.vmap(lambda kk: jax.random.uniform(
                kk, dtype=rdt))(k_r) < dp  # [B]
            tk = take[:, None]
            psi = CP(jnp.where(tk, jump_re, det.re),
                     jnp.where(tk, jump_im, det.im))
            logp = logp + jnp.where(
                take, chosen_logw,
                jnp.log1p(-jnp.clip(dp, 0.0, 1.0 - 1e-7)))
            return (psi, ks_n, logp), None

        keys0 = jax.random.split(key, n_traj)
        psi_b0 = CP(jnp.broadcast_to(psi0.re.astype(rdt), (n_traj, d)),
                    jnp.broadcast_to(psi0.im.astype(rdt), (n_traj, d)))
        (psis, _, logps), _ = jax.lax.scan(
            step_b, (psi_b0, keys0, jnp.zeros((n_traj,), rdt)),
            (u_diag.T, u_oneq.T, theta_tbl))
        return (psis, logps) if return_logp else psis

    def one_trajectory(k0):
        def step(carry, xs):
            psi, k, logp = carry
            ud, uq = xs
            k, k_r, k_c = jax.random.split(k, 3)
            p2 = cpx.abs2(psi)
            # jump weights dp_k from the CURRENT state
            ws = []
            for bi, bit in enumerate(t1_bits):
                occ = jnp.sum(jnp.where((j_idx & bit) > 0, p2, 0.0))
                ws.append(dt_c * t1_gammas[bi] * occ)
            for di in range(n_deph):
                ws.append(dt_c * 0.5 * deph_gammas[di] * jnp.sum(p2))
            w = jnp.stack(ws) if ws else jnp.zeros((0,), rdt)
            dp = jnp.sum(w)

            det = det_step(psi, ud, uq)
            det = cpx.rscale(det, jax.lax.rsqrt(cpx.norm2(det) + eps))

            # all candidate jump states (normalized), then select
            cand_re, cand_im = [], []
            for bit in t1_bits:
                # sigma^-: psi'[j] = psi[j | bit] if bit clear else 0
                src = j_idx | jnp.int32(bit)
                keep = (j_idx & bit) == 0
                jr = jnp.where(keep, jnp.take(psi.re, src), 0.0)
                ji = jnp.where(keep, jnp.take(psi.im, src), 0.0)
                # maximum (not +eps): a zero-weight candidate then gets a
                # CONSTANT norm, so d(rsqrt)/ds2 ~ s2^{-3/2} never reaches
                # the f32-inf range (0*inf = NaN poisoned the 14q f32
                # score gradients through the stacked-candidate gather)
                s2 = jnp.maximum(jnp.sum(jr * jr + ji * ji), cand_floor)
                nrm = jax.lax.rsqrt(s2)
                cand_re.append(jr * nrm)
                cand_im.append(ji * nrm)
            for bit in deph_bits:
                sgn = jnp.where((j_idx & bit) > 0, -1.0, 1.0).astype(rdt)
                cand_re.append(psi.re * sgn)
                cand_im.append(psi.im * sgn)
            if cand_re:
                cre = jnp.stack(cand_re)
                cim = jnp.stack(cand_im)
                idx = jax.random.categorical(k_c, jnp.log(w + eps))
                jump_re, jump_im = cre[idx], cim[idx]
                chosen_logw = jnp.log(w[idx] + eps)
            else:
                jump_re, jump_im = det.re, det.im
                chosen_logw = jnp.zeros((), rdt)
            take = jax.random.uniform(k_r, dtype=rdt) < dp
            psi = CP(jnp.where(take, jump_re, det.re),
                     jnp.where(take, jump_im, det.im))
            # differentiable trajectory log-likelihood: jump -> log w_k
            # (joint of "jump happened" x "channel k"), no-jump ->
            # log(1 - dp). dp is clipped before log1p so the UNTAKEN
            # where-branch stays finite (NaN in a dead branch still
            # poisons the where gradient).
            logp = logp + jnp.where(
                take, chosen_logw,
                jnp.log1p(-jnp.clip(dp, 0.0, 1.0 - 1e-7)))
            return (psi, k, logp), None

        (psi, _, lp), _ = jax.lax.scan(
            step, (psi0.astype(rdt), k0, jnp.zeros((), rdt)),
            (u_diag.T, u_oneq.T))
        return psi, lp

    keys = jax.random.split(key, n_traj)
    psis, logps = jax.vmap(one_trajectory)(keys)
    # dead when return_logp=False: XLA removes the logp chain entirely
    return (psis, logps) if return_logp else psis


@functools.partial(
    jax.jit,
    static_argnames=("envelope", "horizon", "n_steps", "n_traj", "tol",
                     "t_sample"))
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
    t_sample: str = "left",
) -> CP:
    """CP [n_traj, d] of quantum-jump trajectory endpoints. The trajectory
    mean of <psi|M|psi> estimates tr(M rho(T)) to O(1/sqrt(n_traj)) +
    O(dt) unraveling bias (use the same grid as training; halving dt halves
    the bias)."""
    if ham.is_structured_only:
        raise ValueError("evolve_mcwf needs dense operators")
    from .propagator import time_grid
    dt = (T - T0) / n_steps
    ts = time_grid(T0, dt, n_steps, t_sample)
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
