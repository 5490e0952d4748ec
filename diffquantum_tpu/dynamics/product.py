"""Product-formula (Trotter-splitting) propagator for structured Hamiltonians.

The dense backends (:mod:`.propagator`) exponentiate the full 2^n x 2^n
matrix per step — exact for piecewise-constant H but O(4^n) memory, capping
out around 12-13 qubits. Most analog workloads (QAOA maxcut in particular,
`/root/reference/demo_maxcut.py:71-79`) are built from *structured* terms:

- diagonal terms (Z strings, ZZ couplers) — a length-2^n phase vector;
- single-qubit terms (X/Y/Z drives) — a 2x2 rotation on one tensor axis.

All diagonal terms commute with each other; single-qubit terms on distinct
qubits commute with each other. A second-order Strang splitting

    exp(-i dt H) ≈ exp(-i dt/2 D) [prod_q exp(-i dt u_q G_q)] exp(-i dt/2 D)

has O(dt^3) local error per step (one extra order beyond the O(dt^2)
piecewise-constant envelope error the dense reference semantics already
carry) and costs O(2^n) memory and O(n 2^n) FLOPs per step — no dense
matrices anywhere. When two 1q drives share a qubit (the non-commuting X+Y
two-quadrature pair), the 1q block is applied palindromically (half-angle
forward, half-angle reversed) so the split stays second order; see
:func:`_symmetrize_rots` and tests/test_strang_order.py. This scales the propagator to 16+ qubits (BASELINE.md
stretch config) and is the layout the multi-chip state-sharded engine uses
(:mod:`diffquantum_tpu.parallel.sharded_state`).

Everything operates on CP real pairs and is jit/vmap/grad-compatible.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cpx
from ..ops.cpx import CP
from .hamiltonian import ControlledHamiltonian, TermStructure

_HP = jax.lax.Precision.HIGHEST  # TPU matmul default is bf16 — never ok here


def split_structure(ham: ControlledHamiltonian):
    """Partition control terms into (diag_indices, diag_table) and
    (oneq_indices, qubits, locals). Raises if any term is unstructured or a
    'hop' pair (engines that support hops use
    :func:`split_structure_ext`)."""
    out = split_structure_ext(ham)
    if out[6]:
        raise ValueError(
            "this engine does not support 'hop' (XX+YY) terms; use the "
            "product backend (evolve_product)")
    return out[:6]


def split_structure_ext(ham: ControlledHamiltonian):
    """Like :func:`split_structure` plus the hopping terms:
    (..., hop_idx, hop_pairs) with hop_pairs a list of (i, j) site pairs
    for ``X_i X_j + Y_i Y_j`` generators."""
    if ham.structure is None:
        raise ValueError("product backend needs TermStructure metadata")
    diag_idx, diag_rows = [], []
    oneq_idx, oneq_qubits, oneq_locals = [], [], []
    hop_idx, hop_pairs = [], []
    n = ham.n_qubits
    for k, st in enumerate(ham.structure):
        if st.kind == "diag":
            diag_idx.append(k)
            diag_rows.append(np.asarray(st.diag, dtype=np.float64))
        elif st.kind == "hop":
            if not (0 <= st.qubit < n and 0 <= st.qubit2 < n
                    and st.qubit != st.qubit2):
                raise ValueError(f"term {k}: bad hop pair "
                                 f"({st.qubit}, {st.qubit2})")
            hop_idx.append(k)
            hop_pairs.append((min(st.qubit, st.qubit2),
                              max(st.qubit, st.qubit2)))
        elif st.kind == "1q":
            g = np.asarray(st.local, dtype=np.complex128)
            gd = np.diagonal(g)
            if np.allclose(g, np.diag(gd), atol=1e-12) \
                    and np.max(np.abs(gd.imag)) < 1e-12:
                # a diagonal 1q drive (e.g. a hand-tagged Z) is a diagonal
                # term: route it through the commuting phase block — exact,
                # cheaper, and it keeps fused-kernel eligibility
                row = np.kron(np.kron(np.ones(2**st.qubit), gd.real),
                              np.ones(2 ** (n - st.qubit - 1)))
                diag_idx.append(k)
                diag_rows.append(row)
                continue
            # apply_1q_pauli_rot uses exp(-i th G) = cos(th) I - i sin(th) G,
            # exact ONLY for involutory G; anything else (sigma+, projectors)
            # would silently produce a non-unitary propagator.
            if not np.allclose(g @ g, np.eye(2), atol=1e-9):
                raise ValueError(
                    f"term {k}: 1q generator must be involutory (G @ G = I, "
                    "e.g. a Pauli); got\n" + repr(g) +
                    "\nUse a dense backend for general 2x2 generators.")
            oneq_idx.append(k)
            oneq_qubits.append(st.qubit)
            oneq_locals.append(g)
        else:
            raise ValueError(f"term {k} has no product structure ({st.kind})")
    h0 = ham.h0_structure
    if h0 is None or h0.kind != "diag":
        raise ValueError("product backend needs a diagonal (or zero) H0")
    return (diag_idx, diag_rows, np.asarray(h0.diag, dtype=np.float64),
            oneq_idx, oneq_qubits, oneq_locals, hop_idx, hop_pairs)


def _phase(theta: jnp.ndarray) -> CP:
    """exp(-i theta) as CP (elementwise)."""
    return CP(jnp.cos(theta), -jnp.sin(theta))


def apply_1q_pauli_rot(psi: CP, theta, qubit: int, n_qubits: int,
                       local_re: jnp.ndarray, local_im: jnp.ndarray) -> CP:
    """Apply exp(-i theta G) for an involutory 2x2 generator G (G^2 = I,
    e.g. any Pauli): exactly cos(theta) I - i sin(theta) G.

    psi: CP [..., 2^n]; the gate acts on tensor axis ``qubit`` (0 = MSB).
    """
    lead = psi.re.shape[:-1]
    left = 2**qubit
    right = 2 ** (n_qubits - qubit - 1)
    shape = lead + (left, 2, right)
    pre, pim = psi.re.reshape(shape), psi.im.reshape(shape)

    # (G psi) on the length-2 axis: g[a, b] psi[..., b, ...]
    def gmul(xre, xim):
        yre = jnp.einsum("ab,...lbr->...lar", local_re, xre, precision=_HP) \
            - jnp.einsum("ab,...lbr->...lar", local_im, xim, precision=_HP)
        yim = jnp.einsum("ab,...lbr->...lar", local_re, xim, precision=_HP) \
            + jnp.einsum("ab,...lbr->...lar", local_im, xre, precision=_HP)
        return yre, yim

    gre, gim = gmul(pre, pim)
    c, s = jnp.cos(theta), jnp.sin(theta)
    # cos * psi - i sin * (G psi);  -i(a+ib) = b - ia
    out_re = c * pre + s * gim
    out_im = c * pim - s * gre
    flat = lead + (left * 2 * right,)
    return CP(out_re.reshape(flat), out_im.reshape(flat))


def _hop_slices(psi: CP, qi: int, qj: int, n_qubits: int):
    """Reshape CP [..., 2^n] to expose the (qi, qj) qubit axes (qi < qj):
    returns arrays of shape [..., L, 2, M, 2, R]."""
    lead = psi.re.shape[:-1]
    L = 2**qi
    M = 2 ** (qj - qi - 1)
    R = 2 ** (n_qubits - qj - 1)
    shape = lead + (L, 2, M, 2, R)
    return psi.re.reshape(shape), psi.im.reshape(shape)


def apply_hop_rot(psi: CP, theta, qi: int, qj: int, n_qubits: int) -> CP:
    """exp(-i theta (X_i X_j + Y_i Y_j)) exactly: G = XX + YY acts as
    2*SWAP on the {|01>, |10>} subspace and 0 on {|00>, |11>}, so the
    exponential rotates |01>,|10> by 2 theta and leaves 00/11 untouched.
    Number-conserving — the natural molecular hopping drive."""
    pre, pim = _hop_slices(psi, qi, qj, n_qubits)
    c = jnp.cos(2.0 * theta)
    s = jnp.sin(2.0 * theta)
    a_re, a_im = pre[..., :, 0, :, 1, :], pim[..., :, 0, :, 1, :]  # |01>
    b_re, b_im = pre[..., :, 1, :, 0, :], pim[..., :, 1, :, 0, :]  # |10>
    na_re = c * a_re + s * b_im
    na_im = c * a_im - s * b_re
    nb_re = c * b_re + s * a_im
    nb_im = c * b_im - s * a_re
    # reassemble along the two qubit axes
    z_re = jnp.stack([
        jnp.stack([pre[..., :, 0, :, 0, :], na_re], axis=-2),
        jnp.stack([nb_re, pre[..., :, 1, :, 1, :]], axis=-2),
    ], axis=-4)
    z_im = jnp.stack([
        jnp.stack([pim[..., :, 0, :, 0, :], na_im], axis=-2),
        jnp.stack([nb_im, pim[..., :, 1, :, 1, :]], axis=-2),
    ], axis=-4)
    flat = psi.re.shape
    return CP(z_re.reshape(flat), z_im.reshape(flat))


def apply_hop_operator(psi: CP, qi: int, qj: int, n_qubits: int) -> CP:
    """((X_i X_j + Y_i Y_j) psi): 2x subspace swap, zero on 00/11."""
    pre, pim = _hop_slices(psi, qi, qj, n_qubits)
    a_re, a_im = pre[..., :, 0, :, 1, :], pim[..., :, 0, :, 1, :]
    b_re, b_im = pre[..., :, 1, :, 0, :], pim[..., :, 1, :, 0, :]
    zero_re = jnp.zeros_like(a_re)
    z_re = jnp.stack([
        jnp.stack([zero_re, 2.0 * b_re], axis=-2),
        jnp.stack([2.0 * a_re, zero_re], axis=-2),
    ], axis=-4)
    z_im = jnp.stack([
        jnp.stack([zero_re, 2.0 * b_im], axis=-2),
        jnp.stack([2.0 * a_im, zero_re], axis=-2),
    ], axis=-4)
    flat = psi.re.shape
    return CP(z_re.reshape(flat), z_im.reshape(flat))


def apply_1q_operator(psi: CP, qubit: int, n_qubits: int,
                      local_re: jnp.ndarray, local_im: jnp.ndarray) -> CP:
    """(G psi) for a single-qubit operator G on tensor axis ``qubit``."""
    lead = psi.re.shape[:-1]
    left = 2**qubit
    right = 2 ** (n_qubits - qubit - 1)
    shape = lead + (left, 2, right)
    pre, pim = psi.re.reshape(shape), psi.im.reshape(shape)
    gre = jnp.einsum("ab,...lbr->...lar", local_re, pre, precision=_HP) \
        - jnp.einsum("ab,...lbr->...lar", local_im, pim, precision=_HP)
    gim = jnp.einsum("ab,...lbr->...lar", local_re, pim, precision=_HP) \
        + jnp.einsum("ab,...lbr->...lar", local_im, pre, precision=_HP)
    flat = lead + (left * 2 * right,)
    return CP(gre.reshape(flat), gim.reshape(flat))


def apply_structured_terms(ham: ControlledHamiltonian, psi: CP):
    """(H_k psi) for every control term k, matrix-free.

    Returns (re, im) arrays of shape [n_controls, d]. Used by the MC
    gradient estimator on structured (>13-qubit) problems where no dense
    H_k exists."""
    n = ham.n_qubits
    res_re, res_im = [], []
    for st in ham.structure:
        if st.kind == "diag":
            dvec = jnp.asarray(np.asarray(st.diag), dtype=psi.re.dtype)
            res_re.append(dvec * psi.re)
            res_im.append(dvec * psi.im)
        elif st.kind == "1q":
            g = np.asarray(st.local)
            out = apply_1q_operator(
                psi, st.qubit, n,
                jnp.asarray(g.real, dtype=psi.re.dtype),
                jnp.asarray(g.imag, dtype=psi.re.dtype))
            res_re.append(out.re)
            res_im.append(out.im)
        elif st.kind == "hop":
            out = apply_hop_operator(psi, min(st.qubit, st.qubit2),
                                     max(st.qubit, st.qubit2), n)
            res_re.append(out.re)
            res_im.append(out.im)
        else:
            raise ValueError(f"unstructured term {st.kind!r}")
    return jnp.stack(res_re), jnp.stack(res_im)


def _pauli_kind(local) -> str | None:
    g = np.asarray(local)
    if np.allclose(g, np.array([[0, 1], [1, 0]])):
        return "x"
    if np.allclose(g, np.array([[0, -1j], [1j, 0]])):
        return "y"
    return None


def _symmetrize_rots(qubits, kinds, theta_x, axis: int):
    """Palindromic 1q sub-step ordering when two drives share a qubit (the
    non-commuting X+Y two-quadrature case): half angles forward, then half
    angles in reversed order — restores the Strang split's O(dt^2) global
    error. The fused kernel's internal row/lane partitioning only reorders
    rotations on DISTINCT qubits (which commute), so the palindrome of
    same-qubit pairs survives the partition. No-op for distinct qubits."""
    if len(set(qubits)) == len(qubits):
        return tuple(qubits), tuple(kinds), theta_x
    half = 0.5 * theta_x
    rev = jnp.flip(half, axis=axis)
    return (tuple(qubits) + tuple(reversed(tuple(qubits))),
            tuple(kinds) + tuple(reversed(tuple(kinds))),
            jnp.concatenate([half, rev], axis=axis))


def fused_eligible(ham: ControlledHamiltonian) -> bool:
    """Whether the fused Pallas whole-evolution kernel applies: 10-17 qubits
    (sublane-aligned [2^(n-7), 128] state block; beyond 17 the backward
    kernel's ~14 state-sized VMEM buffers exceed the 16 MiB budget — use the
    XLA product backend or the sharded engine there), diagonal H0, and every
    1q term a Pauli X or Y."""
    if ham.structure is None or not (10 <= ham.n_qubits <= 17):
        return False
    if ham.h0_structure is None or ham.h0_structure.kind != "diag":
        return False
    for st in ham.structure:
        if st.kind == "1q" and _pauli_kind(st.local) is None:
            g = np.asarray(st.local)
            diag_local = (np.allclose(g, np.diag(np.diagonal(g)),
                                      atol=1e-12)
                          and np.max(np.abs(np.diagonal(g).imag)) < 1e-12)
            if not diag_local:  # diagonal 1q (Z-like) folds into the phases
                return False
        if st.kind not in ("diag", "1q"):
            return False
    return True


@functools.partial(
    jax.jit,
    static_argnames=("envelope", "horizon", "n_steps", "dt_bound",
                     "precision", "t_sample"))
def evolve_product_fused(
    ham: ControlledHamiltonian,
    envelope,
    coeff: jnp.ndarray,
    psi0: CP,
    T0,
    T,
    horizon: float,
    n_steps: int,
    dt_bound=None,
    precision: str = "full",
    t_sample: str = "left",
) -> CP:
    """Same math as :func:`evolve_product`, executed by the fused Pallas
    whole-evolution kernel (:mod:`..ops.fused_product`): the entire
    n_steps-long Strang chain runs as ONE kernel with the state resident in
    VMEM, plus an exact custom-VJP adjoint kernel for gradients.

    ``precision``: 'full' (3-pass f32 in-kernel matmuls, default) or 'fast'
    (single-pass bf16 MXU — ~25% faster 16q chains / ~40% faster 64-seed
    epochs, amplitude error ~6e-5 vs 1.6e-6 over 30 steps; see
    docs/PERFORMANCE.md)."""
    from ..ops.fused_product import fused_product_evolve

    if precision not in ("full", "fast"):
        raise ValueError(f"precision must be 'full' or 'fast', "
                         f"got {precision!r}")
    fast = precision == "fast"

    n = ham.n_qubits
    (diag_idx, diag_rows, h0_diag, oneq_idx, oneq_qubits,
     oneq_locals) = split_structure(ham)

    from .propagator import time_grid
    dt = (T - T0) / n_steps
    ts = time_grid(T0, dt, n_steps, t_sample)
    rdt = jnp.float32
    dtc = jnp.asarray(dt, rdt)

    diag_table = jnp.asarray(np.stack(diag_rows), dtype=rdt) if diag_rows \
        else jnp.zeros((0, ham.dim), dtype=rdt)
    h0_vec = jnp.asarray(h0_diag, dtype=rdt)
    di = jnp.asarray(diag_idx, dtype=jnp.int32)
    qi = jnp.asarray(oneq_idx, dtype=jnp.int32)

    batched = psi0.ndim > 1
    per_seed = coeff.ndim == len(envelope.coeff_shape) + 1
    if batched:
        from ..ops.fused_product import fused_product_evolve_batched
        b = psi0.shape[0]
        if per_seed:
            u = jax.vmap(lambda c: envelope.amplitudes(c, ts, horizon))(coeff)
        else:
            u1 = envelope.amplitudes(coeff, ts, horizon)
            u = jnp.broadcast_to(u1[None], (b,) + u1.shape)
        # u: [B, n_controls, n_steps]
        u_diag = jnp.take(u, di, axis=1).astype(rdt)   # [B, n_diag, T]
        u_oneq = jnp.take(u, qi, axis=1).astype(rdt)   # [B, n_x, T]
        theta_half = 0.5 * dtc * (h0_vec[None, None, :]
                                  + jnp.einsum("bkt,kd->tbd", u_diag,
                                               diag_table, precision=_HP))
        theta_x = dtc * jnp.moveaxis(u_oneq, 2, 0)     # [T, B, n_x]
        kinds = tuple(_pauli_kind(g) for g in oneq_locals)
        if any(k is None for k in kinds):
            raise ValueError(
                "fused backend supports Pauli X/Y 1q drives only (diagonal "
                "locals fold into the phases); use backend='product' for "
                "general involutory generators")
        oneq_qubits, kinds, theta_x = _symmetrize_rots(
            oneq_qubits, kinds, theta_x, axis=2)

        # chunk the batch so the backward kernel's VMEM footprint
        # (~14 state-sized buffers) stays under the ~16 MiB budget
        r_rows = ham.dim // 128
        bytes_per_seed = r_rows * 128 * 4 * 14
        b_max = max(1, int((12 * 2**20) // bytes_per_seed))
        chunk = 1
        while chunk * 2 <= min(b, b_max):
            chunk *= 2
        if chunk >= b:
            return fused_product_evolve_batched(
                psi0.astype(rdt), theta_half, theta_x, tuple(oneq_qubits),
                n, kinds, fast)
        outs = []
        psi32 = psi0.astype(rdt)
        for s0 in range(0, b, chunk):
            sl = slice(s0, min(s0 + chunk, b))
            outs.append(fused_product_evolve_batched(
                psi32[sl], theta_half[:, sl], theta_x[:, sl],
                tuple(oneq_qubits), n, kinds, fast))
        return CP(jnp.concatenate([o.re for o in outs], axis=0),
                  jnp.concatenate([o.im for o in outs], axis=0))

    u = envelope.amplitudes(coeff, ts, horizon)  # [n_controls, n_steps]
    u_diag = (u[di] if diag_idx else
              jnp.zeros((0, n_steps), dtype=u.dtype)).astype(rdt)
    u_oneq = (u[qi] if oneq_idx else
              jnp.zeros((0, n_steps), dtype=u.dtype)).astype(rdt)

    # per-step angle tables for the kernel
    theta_half = 0.5 * dtc * (h0_vec[None, :] + jnp.matmul(u_diag.T, diag_table, precision=_HP))
    theta_x = dtc * u_oneq.T  # [n_steps, n_x]

    kinds = tuple(_pauli_kind(g) for g in oneq_locals)
    if any(k is None for k in kinds):
        raise ValueError(
            "fused backend supports Pauli X/Y 1q drives only (diagonal "
            "locals fold into the phases); use backend='product' for "
            "general involutory generators")
    oneq_qubits, kinds, theta_x = _symmetrize_rots(
        oneq_qubits, kinds, theta_x, axis=1)
    out = fused_product_evolve(psi0.astype(rdt), theta_half, theta_x,
                               tuple(oneq_qubits), n, kinds, fast)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("envelope", "horizon", "n_steps", "dt_bound",
                     "t_sample"))
def evolve_product(
    ham: ControlledHamiltonian,
    envelope,
    coeff: jnp.ndarray,
    psi0: CP,
    T0,
    T,
    horizon: float,
    n_steps: int,
    dt_bound: Optional[float] = None,
    t_sample: str = "left",
) -> CP:
    """Strang-split evolution for diag + single-qubit (+ hopping-pair)
    structured H.

    Same grid semantics as :func:`..dynamics.propagator.evolve` (left
    endpoint, n_steps static); interchangeable for structured problems.
    """
    n = ham.n_qubits
    if n < 0:
        raise ValueError("dimension is not a power of two")
    (diag_idx, diag_rows, h0_diag, oneq_idx, oneq_qubits,
     oneq_locals, hop_idx, hop_pairs) = split_structure_ext(ham)

    from .propagator import time_grid
    dt = (T - T0) / n_steps
    ts = time_grid(T0, dt, n_steps, t_sample)
    u = envelope.amplitudes(coeff, ts, horizon)  # [n_controls, n_steps]
    rdt = ham.dtype

    diag_table = jnp.asarray(np.stack(diag_rows), dtype=rdt) if diag_rows \
        else jnp.zeros((0, ham.dim), dtype=rdt)
    h0_vec = jnp.asarray(h0_diag, dtype=rdt)
    u_diag = u[jnp.asarray(diag_idx, dtype=jnp.int32)] if diag_idx else \
        jnp.zeros((0, n_steps), dtype=u.dtype)
    u_oneq = u[jnp.asarray(oneq_idx, dtype=jnp.int32)] if oneq_idx else \
        jnp.zeros((0, n_steps), dtype=u.dtype)
    u_hop = u[jnp.asarray(hop_idx, dtype=jnp.int32)] if hop_idx else \
        jnp.zeros((0, n_steps), dtype=u.dtype)

    locals_re = [jnp.asarray(g.real, dtype=rdt) for g in oneq_locals]
    locals_im = [jnp.asarray(g.imag, dtype=rdt) for g in oneq_locals]

    psi0 = psi0.astype(rdt)
    u_diag = u_diag.astype(rdt)
    u_oneq = u_oneq.astype(rdt)
    u_hop = u_hop.astype(rdt)
    dt = jnp.asarray(dt, dtype=rdt)

    # Two non-commuting drives sharing a qubit (the X+Y two-quadrature
    # pair, or a hop overlapping a 1q drive) break the naive sequential
    # sub-step product's palindrome and silently degrade the splitting to
    # first order; a half-angle forward + half-angle reversed sweep
    # restores O(dt^2) global error. Disjoint terms commute, so the cheap
    # single sweep is kept for them (static decision at trace time).
    rot_ops = [("1q", i) for i in range(len(oneq_qubits))] \
        + [("hop", j) for j in range(len(hop_pairs))]
    used = list(oneq_qubits) + [q for pr in hop_pairs for q in pr]
    palindromic = len(set(used)) < len(used)

    @jax.checkpoint
    def step(psi, xs):
        ud, uq, uh = xs  # [n_diag], [n_oneq], [n_hop]
        # total diagonal this step: h0 + sum_k ud[k] diag_k → [d]
        theta_half = (0.5 * dt) * (h0_vec + jnp.matmul(ud, diag_table, precision=_HP))
        ph = _phase(theta_half)
        psi = cpx.mul(CP(jnp.broadcast_to(ph.re, psi.re.shape),
                         jnp.broadcast_to(ph.im, psi.im.shape)), psi)
        order = rot_ops + rot_ops[::-1] if palindromic else rot_ops
        frac = 0.5 * dt if palindromic else dt
        for kind, i in order:
            if kind == "1q":
                psi = apply_1q_pauli_rot(psi, frac * uq[i], oneq_qubits[i],
                                         n, locals_re[i], locals_im[i])
            else:
                qi, qj = hop_pairs[i]
                psi = apply_hop_rot(psi, frac * uh[i], qi, qj, n)
        psi = cpx.mul(CP(jnp.broadcast_to(ph.re, psi.re.shape),
                         jnp.broadcast_to(ph.im, psi.im.shape)), psi)
        return psi, None

    psi, _ = jax.lax.scan(step, psi0, (u_diag.T, u_oneq.T, u_hop.T))
    return psi


@functools.partial(
    jax.jit,
    static_argnames=("envelope", "horizon", "n_steps", "t_sample"))
def evolve_product_trajectory(
    ham: ControlledHamiltonian,
    envelope,
    coeff: jnp.ndarray,
    psi0: CP,
    T0,
    T,
    horizon: float,
    n_steps: int,
    t_sample: str = "left",
) -> CP:
    """Like :func:`evolve_product` but returns the state at EVERY grid
    point — CP [n_steps + 1, ..., d] including psi(T0), the mesolve
    full-history semantics (`/root/reference/sim_plain.py:330`) at
    product-formula scale (the dense :func:`..dynamics.propagator.
    evolve_trajectory` needs dense operators). Memory: (n_steps+1) states
    — at 16 qubits x 1000 steps that is ~0.5 GB f32; slice the segment if
    that matters."""
    n = ham.n_qubits
    (diag_idx, diag_rows, h0_diag, oneq_idx, oneq_qubits,
     oneq_locals) = split_structure(ham)
    from .propagator import time_grid
    dt = (T - T0) / n_steps
    ts = time_grid(T0, dt, n_steps, t_sample)
    u = envelope.amplitudes(coeff, ts, horizon)
    rdt = ham.dtype

    diag_table = jnp.asarray(np.stack(diag_rows), dtype=rdt) if diag_rows \
        else jnp.zeros((0, ham.dim), dtype=rdt)
    h0_vec = jnp.asarray(h0_diag, dtype=rdt)
    u_diag = (u[jnp.asarray(diag_idx, jnp.int32)] if diag_idx else
              jnp.zeros((0, n_steps), dtype=u.dtype)).astype(rdt)
    u_oneq = (u[jnp.asarray(oneq_idx, jnp.int32)] if oneq_idx else
              jnp.zeros((0, n_steps), dtype=u.dtype)).astype(rdt)
    locals_re = [jnp.asarray(g.real, dtype=rdt) for g in oneq_locals]
    locals_im = [jnp.asarray(g.imag, dtype=rdt) for g in oneq_locals]
    psi0 = psi0.astype(rdt)
    dt_c = jnp.asarray(dt, dtype=rdt)
    palindromic = len(set(oneq_qubits)) < len(oneq_qubits)
    m = len(oneq_qubits)
    order = list(range(m)) + list(reversed(range(m))) if palindromic \
        else list(range(m))
    frac = 0.5 * dt_c if palindromic else dt_c

    def step(psi, xs):
        ud, uq = xs
        theta_half = (0.5 * dt_c) * (h0_vec + jnp.matmul(
            ud, diag_table, precision=_HP))
        ph = _phase(theta_half)
        psi = cpx.mul(CP(jnp.broadcast_to(ph.re, psi.re.shape),
                         jnp.broadcast_to(ph.im, psi.im.shape)), psi)
        for i in order:
            psi = apply_1q_pauli_rot(psi, frac * uq[i], oneq_qubits[i], n,
                                     locals_re[i], locals_im[i])
        psi = cpx.mul(CP(jnp.broadcast_to(ph.re, psi.re.shape),
                         jnp.broadcast_to(ph.im, psi.im.shape)), psi)
        return psi, psi

    _, traj = jax.lax.scan(step, psi0, (u_diag.T, u_oneq.T))
    return CP(jnp.concatenate([psi0.re[None], traj.re], axis=0),
              jnp.concatenate([psi0.im[None], traj.im], axis=0))
