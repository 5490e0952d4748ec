"""Fused whole-evolution Pallas kernel for the product-formula propagator.

The XLA product backend (:mod:`..dynamics.product`) emits ~50 small VPU ops
per Strang step; at 12 qubits that is ~285 us/step of pure op overhead. This
kernel runs the ENTIRE time-ordered evolution in one Pallas program: the
state pair lives in VMEM scratch across all steps (the TPU grid is
sequential, scratch persists), per-step phase angles stream in as grid
blocks, and the backward pass is a second kernel implementing the exact
adjoint evolution with on-the-fly state reconstruction (unitary steps are
inverted, not stored) — O(1) memory in the step count.

Layout: the 2^n amplitudes sit in a [R, 128] block, R = 2^(n-7): the last 7
qubits are *lane* qubits, the rest *row* qubits.

- diagonal phase exp(-i theta) — elementwise on the block;
- X rotation on a row qubit — a sublane-axis flip (reshape + reverse);
- X rotation on a lane qubit — one [R,128]x[128,128] MXU matmul with a
  constant XOR-permutation matrix P (P[l, l^m] = 1).

Per step: 2 phase applications + n_x rotations, all register/VMEM resident.

Forward/backward math (real-pair convention, L real):
  phase    y = e^{-i th} x:  dL/dth = lam_re*y_im - lam_im*y_re (elementwise)
           lam_x = e^{+i th} lam_y;  x = e^{+i th} y
  X-rot    y = c x - i s Gx (G = flip, real symmetric involutory):
           dL/dth = sum lam_re*(-s x_re + c (Gx)_im)
                       + lam_im*(-s x_im - c (Gx)_re)
           lam_x = c lam + i s G lam;  x = c y + i s G y

Restrictions (wrapper falls back to the XLA path otherwise): n_qubits >= 10
(so R is sublane-aligned), all 1q control terms are Pauli-X, single
unbatched state, f32.
"""
from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cpx import CP

_LANES = 128
_LANE_QUBITS = 7  # log2(_LANES)


def _pdot(x: jnp.ndarray, p: jnp.ndarray, fast: bool = False) -> jnp.ndarray:
    """x @ P. Default: full f32 precision (3-pass — the MXU's default
    truncates inputs to bf16, measurable amplitude drift over long chains).
    ``fast=True`` keeps the single-pass bf16 MXU path: ~25-40% faster
    whole-kernel, amplitude error ~6e-5 (vs 1.6e-6) over a 30-step chain —
    the ``precision='fast'`` knob for tolerance-bounded workloads."""
    return jax.lax.dot_general(
        x, p, (((1,), (0,)), ((), ())),
        precision=None if fast else jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _xor_perm_matrix(mask: int) -> np.ndarray:
    """X on a lane qubit: (x @ P)_c = x_{c^mask}."""
    p = np.zeros((_LANES, _LANES), dtype=np.float32)
    for l in range(_LANES):
        p[l, l ^ mask] = 1.0
    return p


def _xor_signed_matrix(mask: int) -> np.ndarray:
    """K for Y on a lane qubit: (x @ K)_c = (2 bit_c - 1) x_{c^mask},
    where bit_c is the qubit's bit in lane index c. exp(-i th Y) =
    cos th I + sin th K with K real, antisymmetric, orthogonal."""
    k = np.zeros((_LANES, _LANES), dtype=np.float32)
    for c in range(_LANES):
        bit = 1.0 if (c & mask) else -1.0
        k[c ^ mask, c] = bit
    return k


def _perm_stack(lane_rots, n_qubits) -> np.ndarray:
    """One (possibly signed) permutation matrix per lane rotation."""
    if not lane_rots:
        return np.zeros((1, _LANES, _LANES), np.float32)
    mats = []
    for (_, q, kind) in lane_rots:
        mask = 1 << (n_qubits - 1 - q)
        mats.append(_xor_perm_matrix(mask) if kind == "x"
                    else _xor_signed_matrix(mask))
    return np.stack(mats)


def _as_perms_operand(perms: np.ndarray) -> jnp.ndarray:
    """Lift a stacked XOR-(signed-)permutation array to the device as an
    iota PROGRAM instead of a dense constant. Each [128, 128] f32 matrix
    serializes to ~131 KiB of MLIR and the mega kernels carry dozens,
    twice (forward + backward) — megabytes of constants per 19-24q
    program, which slows every compile (compile time is the binding
    constraint on this toolchain, docs/PERFORMANCE.md). Any matrix that
    is not an XOR (signed) permutation falls back to the dense stack."""
    if perms.ndim != 3 or perms.shape[1:] != (_LANES, _LANES):
        return jnp.asarray(perms)
    specs = []
    for mat in perms:
        nz = np.nonzero(mat[0])[0]
        if nz.size != 1:
            return jnp.asarray(perms)
        mask = int(nz[0])
        if np.array_equal(mat, _xor_perm_matrix(mask)):
            specs.append((mask, False))
        elif np.array_equal(mat, _xor_signed_matrix(mask)):
            specs.append((mask, True))
        else:
            return jnp.asarray(perms)
    l = jax.lax.iota(jnp.int32, _LANES)
    r_, c_ = l[:, None], l[None, :]
    outs = []
    for mask, signed in specs:
        hit = jnp.equal(jnp.bitwise_xor(r_, jnp.int32(mask)), c_)
        val = jnp.where(jnp.bitwise_and(c_, jnp.int32(mask)) > 0,
                        1.0, -1.0) if signed else 1.0
        outs.append(jnp.where(hit, val, 0.0).astype(jnp.float32))
    return jnp.stack(outs)


def _plan_ops(x_qubits: Sequence, kinds: Sequence[str], n_qubits: int):
    """Ordered op plan for the STREAMED kernels. ``x_qubits`` entries are
    an int (1q X/Y rotation on that qubit) or an ``(i, j)`` pair with kind
    ``'hop'`` (the number-conserving XX+YY generator,
    `dynamics/product.py::apply_hop_rot`). Sequence order is PRESERVED
    in-kernel — hops do not commute with 1q rotations on their own sites,
    so the row/lane partition used elsewhere would be wrong here.

    Returns (ops, perms): ops entries are
    ``(j, kind, row_bits, perm_idx, mask_spec)`` — j the angle slot,
    row_bits the sublane-axis bits to flip (0-2 of them), perm_idx an
    index into the stacked lane (signed) permutation matrices or None,
    and mask_spec (hop only) two ``(is_row, shift)`` bit descriptors of
    the global index for the {01, 10} subspace indicator."""
    n_row = n_qubits - _LANE_QUBITS
    ops, mats = [], []
    for j, (ent, kind) in enumerate(zip(x_qubits, kinds)):
        if kind == "hop":
            qi, qj = ent
            row_bits = tuple(q for q in (qi, qj) if q < n_row)
            lane_mask = 0
            for q in (qi, qj):
                if q >= n_row:
                    lane_mask |= 1 << (n_qubits - 1 - q)
            perm_idx = None
            if lane_mask:
                perm_idx = len(mats)
                mats.append(_xor_perm_matrix(lane_mask))
            mask_spec = tuple(
                (True, n_row - 1 - q) if q < n_row
                else (False, n_qubits - 1 - q) for q in (qi, qj))
            ops.append((j, "hop", row_bits, perm_idx, mask_spec))
        elif ent < n_row:
            ops.append((j, kind, (ent,), None, None))
        else:
            mask = 1 << (n_qubits - 1 - ent)
            perm_idx = len(mats)
            mats.append(_xor_perm_matrix(mask) if kind == "x"
                        else _xor_signed_matrix(mask))
            ops.append((j, kind, (), perm_idx, None))
    perms = np.stack(mats).astype(np.float32) if mats else \
        np.zeros((1, _LANES, _LANES), np.float32)
    return ops, perms


def _hop_mask(shape, mask_spec):
    """{|01>, |10>} subspace indicator as f32 of the given state shape
    ([R, 128] or [B, R, 128]): XOR of the hop pair's two bits of the
    global amplitude index."""
    rk = len(shape)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, shape, rk - 2)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, shape, rk - 1)
    bits = []
    for (is_row, shift) in mask_spec:
        src = row_ids if is_row else lane_ids
        bits.append(jnp.bitwise_and(
            jax.lax.shift_right_logical(src, np.int32(shift)),
            np.int32(1)))
    return jnp.bitwise_xor(bits[0], bits[1]).astype(jnp.float32)


def _split_qubits(x_qubits: Sequence[int], kinds: Sequence[str], n: int):
    """(row_rotations, lane_rotations) as (j, q, kind) triples: row →
    sublane flip, lane → index into the stacked (signed) permutation
    matrices."""
    rows, lanes = [], []
    for j, (q, kind) in enumerate(zip(x_qubits, kinds)):
        if q < n - _LANE_QUBITS:
            rows.append((j, q, kind))
        else:
            lanes.append((j, q, kind))
    return rows, lanes


def _flip_row(x: jnp.ndarray, bit: int, n_row_bits: int) -> jnp.ndarray:
    """Reverse the sublane-axis bit ``bit`` (0 = MSB of the row index)."""
    r = x.shape[0]
    hi = 2**bit
    mid = 2
    lo = r // (hi * mid)
    y = x.reshape(hi, mid, lo, _LANES)
    # swap the two halves of the size-2 axis (jnp.flip/`rev` has no Mosaic
    # lowering; static slice + concat does)
    y = jnp.concatenate([y[:, 1:2], y[:, 0:1]], axis=1)
    return y.reshape(r, _LANES)


def _sflip_row(x: jnp.ndarray, bit: int, n_row_bits: int) -> jnp.ndarray:
    """Signed pair-swap (the Y 'K' operator on a row qubit):
    (Kx)_{b=0 half} = -x_{b=1 half}; (Kx)_{b=1 half} = +x_{b=0 half}."""
    r = x.shape[0]
    hi = 2**bit
    lo = r // (hi * 2)
    y = x.reshape(hi, 2, lo, _LANES)
    y = jnp.concatenate([-y[:, 1:2], y[:, 0:1]], axis=1)
    return y.reshape(r, _LANES)


def _pad_tx(theta_x: jnp.ndarray) -> jnp.ndarray:
    """[n_steps, n_x] → [n_steps, 1, 128] f32 (lane-aligned block)."""
    n_steps, n_x = theta_x.shape
    out = jnp.zeros((n_steps, 1, _LANES), jnp.float32)
    return out.at[:, 0, :n_x].set(theta_x.astype(jnp.float32))


def _multi_map(g_of):
    """Plane-wise generator application (flip-only ops — packing a VPU
    copy buys nothing)."""
    return lambda vs: [g_of(v) for v in vs]


def _multi_dot(p, dot, fast):
    """One lane-permutation matmul over SEVERAL planes as a single packed
    MXU invocation: concat along the sublane axis → one [k·R, 128] x
    [128, 128] matmul (same FLOPs as k separate calls, but one weight
    load / pipeline fill instead of k — the MXU-invocation halving noted
    in docs/STATUS.md), then split back by static slices."""
    def g_multi(vs):
        if len(vs) == 1:
            return [dot(vs[0], p, fast)]
        rr = vs[0].shape[-2]
        out = dot(jnp.concatenate(vs, axis=-2), p, fast)
        return [jax.lax.slice_in_dim(out, i * rr, (i + 1) * rr, axis=-2)
                for i in range(len(vs))]
    return g_multi


def _op_generator_multi(op, perms_ref, n_row_bits, fast, flip, sflip, dot):
    """Multi-plane form of :func:`_op_generator`: row-bit flips apply per
    plane; the lane matmul (if any) runs PACKED across all planes."""
    (_, kind, row_bits, perm_idx, _) = op

    def g_multi(vs):
        f = sflip if kind == "y" else flip
        for b in row_bits:
            vs = [f(v, b, n_row_bits) for v in vs]
        if perm_idx is not None:
            vs = _multi_dot(perms_ref[perm_idx], dot, fast)(vs)
        return vs

    return g_multi


def merge_phase_rows(theta_half: jnp.ndarray) -> jnp.ndarray:
    """Cross-step phase merge (round 5): the trailing half-phase of step t
    and the leading half-phase of step t+1 commute (both diagonal) and
    fuse into ONE application — P(th_0) R_0 P(th_0+th_1) R_1 ...
    R_{T-1} P(th_{T-1}). [T, ...] half-step rows -> [T+1, ...] merged
    rows; phase work per step drops from 2 applications to ~1 (the
    phase pipeline is ~half the VPU cost of a ring-graph step —
    docs/PERFORMANCE.md roofline). Exact, not an approximation. The
    gradient transpose is :func:`unmerge_phase_grads`."""
    return jnp.concatenate(
        [theta_half[:1], theta_half[:-1] + theta_half[1:],
         theta_half[-1:]], axis=0)


def unmerge_phase_grads(ga: jnp.ndarray) -> jnp.ndarray:
    """Transpose of :func:`merge_phase_rows`: [T+1, ...] merged-row
    cotangents -> [T, ...] half-step-row cotangents (adjacent sum)."""
    return ga[:-1] + ga[1:]


def _append_zero_row(x: jnp.ndarray) -> jnp.ndarray:
    """[T, ...] rotation-angle rows -> [T+1, ...] with a ZERO row at
    index T. The merged-phase grid has T+1 stages but only T rotation
    sweeps; the extra stage (forward stage T / reversed stage 0) reads
    this zero row and its rotations evaluate to EXACT identities
    (cos 0 = 1, sin 0 = 0 — X/Y/hop blends all reduce to copies), so the
    kernels need no ``pl.when`` gate around the rotation block. A gated
    region allocates its temporaries on a separate Mosaic scope stacked
    ON TOP of the enclosing scope's — chip-measured 58.54 MiB scoped
    demand vs the 48 MiB window for the 16q x 8-trajectory batched
    backward, a compile OOM; the ungated linear schedule fits. The
    angle-gradient row the extra stage produces goes to a discarded
    output row (sliced off host-side)."""
    return jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)


def _make_forward_kernel(n_steps, ops, n_row_bits, fast=False, merged=True):
    r = 2**n_row_bits

    def kernel(th_ref, tx_ref, pin_re, pin_im, perms_ref, out_re, out_im,
               s_re, s_im):
        # merged grid: n_steps + 1 phase stages; unmerged (n_steps == 1 —
        # fused_rot_block and other single-step calls, where the merge
        # buys nothing and the extra identity-rotation stage would double
        # the rotation work): the original [phase; rots; phase] stage
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            s_re[:] = pin_re[:]
            s_im[:] = pin_im[:]

        def phase():
            th = th_ref[0]
            c, s = jnp.cos(th), jnp.sin(th)
            re = c * s_re[:] + s * s_im[:]
            im = c * s_im[:] - s * s_re[:]
            s_re[:] = re
            s_im[:] = im

        def rot(op):
            (j, kind, _, _, mask_spec) = op
            g_multi = _op_generator_multi(op, perms_ref, n_row_bits, fast,
                                          _flip_row, _sflip_row, _pdot)
            th = tx_ref[0, 0, j]
            c, s = jnp.cos(th), jnp.sin(th)
            if kind == "x":
                # y = c x - i s Gx (G real symmetric): planes cross
                g_im, g_re = g_multi([s_im[:], s_re[:]])
                re = c * s_re[:] + s * g_im
                im = c * s_im[:] - s * g_re
            elif kind == "y":
                # Y: exp(-i th Y) = c I + s K (K real): planes independent
                g_re, g_im = g_multi([s_re[:], s_im[:]])
                re = c * s_re[:] + s * g_re
                im = c * s_im[:] + s * g_im
            else:
                # hop (XX+YY): identity on {00, 11}, an X-type rotation by
                # the pre-doubled angle on the {01, 10} subspace. With
                # M the subspace mask and G the both-bits flip:
                # U = (1 + M(c-1)) I - i s M G.
                m = _hop_mask((r, _LANES), mask_spec)
                ct = 1.0 + m * (c - 1.0)
                g_im, g_re = g_multi([s_im[:], s_re[:]])
                re = ct * s_re[:] + s * (m * g_im)
                im = ct * s_im[:] - s * (m * g_re)
            s_re[:] = re
            s_im[:] = im

        phase()
        # merged: stage n_steps reads the appended ZERO tx row — exact
        # identity rotations, no pl.when gate (see _append_zero_row)
        for op in ops:
            rot(op)
        if not merged:
            phase()

        @pl.when(i == (n_steps if merged else n_steps - 1))
        def _():
            out_re[:] = s_re[:]
            out_im[:] = s_im[:]

    return kernel


def _make_backward_kernel(n_steps, ops, n_row_bits, fast=False, merged=True):
    """Reversed-step adjoint: reconstructs the state by inverting each
    unitary op; accumulates dL/dtheta_half (streamed per step) and
    dL/dtheta_x (streamed per step, padded to 128 lanes)."""
    r = 2**n_row_bits

    def kernel(th_ref, tx_ref, pT_re, pT_im, lamT_re, lamT_im, perms_ref,
               gth_ref, gtx_ref, gp0_re, gp0_im, y_re, y_im, l_re, l_im):
        i = pl.program_id(0)  # i-th reversed MERGED stage (n_steps+1 total)

        @pl.when(i == 0)
        def _():
            y_re[:] = pT_re[:]
            y_im[:] = pT_im[:]
            l_re[:] = lamT_re[:]
            l_im[:] = lamT_im[:]

        g_rot = {}  # j -> scalar dL/dtheta_x[j], written once at the end

        # --- undo rotations in reverse order ------------------------------
        # G(x) is derived algebraically from the already-computed G(y):
        # G^2 = I (X flips/XOR perms) and K^2 = -I (Y), so each rotation
        # needs 4 generator applications instead of 6 — on lane qubits
        # that is 2 fewer MXU matmuls, on row qubits 2 fewer flip copies.
        def undo_rot(op):
            (j, kind, _, _, mask_spec) = op
            g_multi = _op_generator_multi(op, perms_ref, n_row_bits, fast,
                                          _flip_row, _sflip_row, _pdot)
            thx = tx_ref[0, 0, j]
            cx, sx = jnp.cos(thx), jnp.sin(thx)
            if kind == "x":
                # reconstruct x = c y + i s G y; lam_x = c lam + i s G lam;
                # dL/dth = sum lam . (-s x - i c Gx); all four generator
                # applications ride ONE packed matmul on lane qubits
                gy_re, gy_im, gl_im, gl_re = g_multi(
                    [y_re[:], y_im[:], l_im[:], l_re[:]])
                x_re = cx * y_re[:] - sx * gy_im
                x_im = cx * y_im[:] + sx * gy_re
                gx_re = cx * gy_re - sx * y_im[:]   # G(x_re), G^2 = I
                gx_im = cx * gy_im + sx * y_re[:]   # G(x_im)
                g_rot[j] = jnp.sum(l_re[:] * (-sx * x_re + cx * gx_im)
                                   + l_im[:] * (-sx * x_im - cx * gx_re))
                nl_re = cx * l_re[:] - sx * gl_im
                nl_im = cx * l_im[:] + sx * gl_re
            elif kind == "y":
                # Y: M = c I + s K orthogonal (K^T = -K) → inverse =
                # transpose = c I - s K, same map for x and lam;
                # dy/dth = -s x + c K x (per plane)
                ky_re, ky_im, kl_re, kl_im = g_multi(
                    [y_re[:], y_im[:], l_re[:], l_im[:]])
                x_re = cx * y_re[:] - sx * ky_re
                x_im = cx * y_im[:] - sx * ky_im
                gx_re = cx * ky_re + sx * y_re[:]   # K(x_re), K^2 = -I
                gx_im = cx * ky_im + sx * y_im[:]   # K(x_im)
                g_rot[j] = jnp.sum(l_re[:] * (-sx * x_re + cx * gx_re)
                                   + l_im[:] * (-sx * x_im + cx * gx_im))
                nl_re = cx * l_re[:] - sx * kl_re
                nl_im = cx * l_im[:] - sx * kl_im
            else:
                # hop: U = ct I - i s Ghat with ct = 1 + M(c-1) elementwise
                # and Ghat = M G (Ghat^2 = M, M and ct are G-invariant).
                # Ghat(x) derives from Ghat(y) exactly as in the X case:
                # Ghat(x_re) = c Ghat(y_re) - s M y_im, etc.
                m = _hop_mask((r, _LANES), mask_spec)
                ct = 1.0 + m * (cx - 1.0)
                ty_re, ty_im, tl_im, tl_re = g_multi(
                    [y_re[:], y_im[:], l_im[:], l_re[:]])
                gy_re = m * ty_re
                gy_im = m * ty_im
                x_re = ct * y_re[:] - sx * gy_im
                x_im = ct * y_im[:] + sx * gy_re
                gx_re = cx * gy_re - sx * (m * y_im[:])   # Ghat(x_re)
                gx_im = cx * gy_im + sx * (m * y_re[:])   # Ghat(x_im)
                g_rot[j] = jnp.sum(
                    l_re[:] * (-sx * (m * x_re) + cx * gx_im)
                    + l_im[:] * (-sx * (m * x_im) - cx * gx_re))
                nl_re = ct * l_re[:] - sx * (m * tl_im)
                nl_im = ct * l_im[:] + sx * (m * tl_re)
            y_re[:] = x_re
            y_im[:] = x_im
            l_re[:] = nl_re
            l_im[:] = nl_im

        def undo_phase():
            """Undo one phase application; returns its dL/dtheta rows
            (grad uses OUTPUT y and output-side lam)."""
            th = th_ref[0]
            c, s = jnp.cos(th), jnp.sin(th)
            g = l_re[:] * y_im[:] - l_im[:] * y_re[:]
            # x = e^{+i th} y ; lam_x = e^{+i th} lam_y
            re = c * y_re[:] - s * y_im[:]
            im = s * y_re[:] + c * y_im[:]
            y_re[:] = re
            y_im[:] = im
            re = c * l_re[:] - s * l_im[:]
            im = s * l_re[:] + c * l_im[:]
            l_re[:] = re
            l_im[:] = im
            return g

        # merged: forward stage i' = n_steps - i is [phase(a_i'); rots_i'];
        # the reversed stage 0 reads the appended ZERO tx row, so its
        # rotations are exact identities and its gtx row lands in the
        # discarded extra output row (no pl.when — see _append_zero_row).
        # unmerged (n_steps == 1): trailing phase first, same th row twice.
        g_trail = None if merged else undo_phase()
        for op in reversed(ops):
            undo_rot(op)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        row = jnp.zeros((1, _LANES), jnp.float32)
        for j, g in g_rot.items():
            row = jnp.where(lane_ids == j, g, row)
        gtx_ref[0] = row

        g_lead = undo_phase()
        gth_ref[0] = g_lead if merged else g_trail + g_lead

        @pl.when(i == (n_steps if merged else n_steps - 1))
        def _():
            gp0_re[:] = l_re[:]
            gp0_im[:] = l_im[:]

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_product_evolve(psi0: CP, theta_half: jnp.ndarray,
                         theta_x: jnp.ndarray, x_qubits: tuple,
                         n_qubits: int, kinds: tuple = None,
                         fast_math: bool = False) -> CP:
    """psi(T) = prod_t [Phi_t Rot_t Phi_t] psi0, fully fused on TPU.

    psi0: CP [2^n]; theta_half: [n_steps, 2^n] diagonal half-step phase
    angles; theta_x: [n_steps, n_x] rotation angles (order = x_qubits);
    kinds: per-rotation generator kind ('x' | 'y'), default all-X;
    fast_math: single-pass bf16 MXU matmuls (see :func:`_pdot`).
    """
    return _forward(psi0, theta_half, theta_x, x_qubits, n_qubits, kinds,
                    fast_math)


def _forward(psi0, theta_half, theta_x, x_qubits, n_qubits, kinds=None,
             fast_math=False):
    kinds = kinds or ("x",) * len(x_qubits)
    n_steps, d = theta_half.shape
    r = d // _LANES
    n_row_bits = n_qubits - _LANE_QUBITS
    ops, perms = _plan_ops(x_qubits, kinds, n_qubits)

    # single-step calls (fused_rot_block et al.) keep the one-stage
    # [phase; rots; phase] schedule: the merge buys nothing at T=1 and
    # its extra identity-rotation stage would double the rotation work
    merged = n_steps > 1
    n_stages = n_steps + 1 if merged else n_steps
    th_op = merge_phase_rows(theta_half.astype(jnp.float32)) if merged \
        else theta_half.astype(jnp.float32)
    tx_op = _pad_tx(theta_x)
    if merged:
        tx_op = _append_zero_row(tx_op)
    kernel = _make_forward_kernel(n_steps, ops, n_row_bits, fast_math,
                                  merged)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(n_stages,),
        in_specs=[
            pl.BlockSpec((1, r, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(perms.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((r, _LANES), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((r, _LANES), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((r, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((r, _LANES), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((r, _LANES), jnp.float32),
                        pltpu.VMEM((r, _LANES), jnp.float32)],
        interpret=(jax.default_backend() == "cpu"),
        **_vmem_params(10, 1, r),
    )(th_op.reshape(n_stages, r, _LANES),
      tx_op,
      psi0.re.reshape(r, _LANES).astype(jnp.float32),
      psi0.im.reshape(r, _LANES).astype(jnp.float32),
      _as_perms_operand(perms))
    return CP(out_re.reshape(d), out_im.reshape(d))


def _fwd(psi0, theta_half, theta_x, x_qubits, n_qubits, kinds=None,
         fast_math=False):
    out = _forward(psi0, theta_half, theta_x, x_qubits, n_qubits, kinds,
                   fast_math)
    return out, (out, theta_half, theta_x)


def _bwd(x_qubits, n_qubits, kinds, fast_math, residuals, lam):
    kinds = kinds or ("x",) * len(x_qubits)
    psi_T, theta_half, theta_x = residuals
    n_steps, d = theta_half.shape
    r = d // _LANES
    n_row_bits = n_qubits - _LANE_QUBITS
    ops, perms = _plan_ops(x_qubits, kinds, n_qubits)

    merged = n_steps > 1
    n_stages = n_steps + 1 if merged else n_steps
    th_op = merge_phase_rows(theta_half.astype(jnp.float32)) if merged \
        else theta_half.astype(jnp.float32)
    tx_op = _pad_tx(theta_x)
    if merged:
        tx_op = _append_zero_row(tx_op)
    kernel = _make_backward_kernel(n_steps, ops, n_row_bits, fast_math,
                                   merged)
    rev = lambda i: (n_stages - 1 - i, 0, 0)  # noqa: E731
    gth, gtx, gp_re, gp_im = pl.pallas_call(
        kernel,
        grid=(n_stages,),
        in_specs=[
            pl.BlockSpec((1, r, _LANES), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _LANES), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((r, _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(perms.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, r, _LANES), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _LANES), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((r, _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_stages, r, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_stages, 1, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((r, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((r, _LANES), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((r, _LANES), jnp.float32),
                        pltpu.VMEM((r, _LANES), jnp.float32),
                        pltpu.VMEM((r, _LANES), jnp.float32),
                        pltpu.VMEM((r, _LANES), jnp.float32)],
        interpret=(jax.default_backend() == "cpu"),
        **_vmem_params(14, 1, r),
    )(th_op.reshape(n_stages, r, _LANES),
      tx_op,
      psi_T.re.reshape(r, _LANES).astype(jnp.float32),
      psi_T.im.reshape(r, _LANES).astype(jnp.float32),
      lam.re.reshape(r, _LANES).astype(jnp.float32),
      lam.im.reshape(r, _LANES).astype(jnp.float32),
      _as_perms_operand(perms))
    gth = gth.reshape(n_stages, d)
    if merged:
        gth = unmerge_phase_grads(gth)
    return (CP(gp_re.reshape(d), gp_im.reshape(d)),
            gth.astype(theta_half.dtype),
            gtx[:n_steps, 0, :theta_x.shape[1]].astype(theta_x.dtype))


fused_product_evolve.defvjp(_fwd, _bwd)


# ===========================================================================
# Batched (seed-parallel) variant: states [B, 2^n] with PER-SEED angles —
# the data-parallel training shape. Same math; blocks carry a leading B dim
# ([B, R, 128] state, per-step angle blocks [B, R, 128] / [B, 128]).
# ===========================================================================

def _bflip_row(x: jnp.ndarray, bit: int) -> jnp.ndarray:
    """Row-bit swap on [B, R, 128]."""
    b, r, _ = x.shape
    hi = 2**bit
    lo = r // (hi * 2)
    y = x.reshape(b, hi, 2, lo, _LANES)
    y = jnp.concatenate([y[:, :, 1:2], y[:, :, 0:1]], axis=2)
    return y.reshape(b, r, _LANES)


def _blane_dot(x: jnp.ndarray, p: jnp.ndarray, fast: bool = False) -> jnp.ndarray:
    """[B, R, 128] @ [128, 128] via a flattened MXU matmul."""
    b, r, _ = x.shape
    return _pdot(x.reshape(b * r, _LANES), p, fast).reshape(b, r, _LANES)


def _make_forward_kernel_b(n_steps, ops, fast=False, merged=True):
    bflip = lambda v, b, _n: _bflip_row(v, b)       # noqa: E731
    bsflip = lambda v, b, _n: _bsflip_row(v, b)     # noqa: E731

    def kernel(th_ref, tx_ref, pin_re, pin_im, perms_ref, out_re, out_im,
               s_re, s_im):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            s_re[:] = pin_re[:]
            s_im[:] = pin_im[:]

        def phase():
            th = th_ref[0]  # [B, R, 128]
            c, s = jnp.cos(th), jnp.sin(th)
            re = c * s_re[:] + s * s_im[:]
            im = c * s_im[:] - s * s_re[:]
            s_re[:] = re
            s_im[:] = im

        def rot(op):
            (j, kind, _, _, mask_spec) = op
            g_multi = _op_generator_multi(op, perms_ref, 0, fast, bflip,
                                          bsflip, _blane_dot)
            th = tx_ref[0, j]  # [B, 1, 128] (angle replicated along lanes)
            c, s = jnp.cos(th), jnp.sin(th)
            if kind == "x":
                g_im, g_re = g_multi([s_im[:], s_re[:]])
                re = c * s_re[:] + s * g_im
                im = c * s_im[:] - s * g_re
            elif kind == "y":  # Y: c I + s K, planes independent
                g_re, g_im = g_multi([s_re[:], s_im[:]])
                re = c * s_re[:] + s * g_re
                im = c * s_im[:] + s * g_im
            else:  # hop: see the unbatched kernel
                m = _hop_mask(s_re.shape, mask_spec)
                ct = 1.0 + m * (c - 1.0)
                g_im, g_re = g_multi([s_im[:], s_re[:]])
                re = ct * s_re[:] + s * (m * g_im)
                im = ct * s_im[:] - s * (m * g_re)
            s_re[:] = re
            s_im[:] = im

        phase()
        # merged: stage n_steps reads the appended ZERO tx row — exact
        # identity rotations, no pl.when gate (see _append_zero_row);
        # unmerged (n_steps == 1): original [phase; rots; phase] stage
        for op in ops:
            rot(op)
        if not merged:
            phase()

        @pl.when(i == (n_steps if merged else n_steps - 1))
        def _():
            out_re[:] = s_re[:]
            out_im[:] = s_im[:]

    return kernel


def _make_backward_kernel_b(n_steps, ops, fast=False, merged=True):
    bflip = lambda v, b, _n: _bflip_row(v, b)       # noqa: E731
    bsflip = lambda v, b, _n: _bsflip_row(v, b)     # noqa: E731

    def kernel(th_ref, tx_ref, pT_re, pT_im, lamT_re, lamT_im, perms_ref,
               gth_ref, gtx_ref, gp0_re, gp0_im, y_re, y_im, l_re, l_im):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            y_re[:] = pT_re[:]
            y_im[:] = pT_im[:]
            l_re[:] = lamT_re[:]
            l_im[:] = lamT_im[:]

        g_rot = {}

        def undo_rot(op):
            # G(x) derived from G(y) via G^2 = I / K^2 = -I: 4 generator
            # applications per rotation instead of 6 (see the unbatched
            # backward kernel), all four packed into ONE lane matmul.
            (j, kind, _, _, mask_spec) = op
            g_multi = _op_generator_multi(op, perms_ref, 0, fast, bflip,
                                          bsflip, _blane_dot)
            thx = tx_ref[0, j]  # [B, 1, 128]
            cx, sx = jnp.cos(thx), jnp.sin(thx)
            if kind == "x":
                gy_re, gy_im, gl_im, gl_re = g_multi(
                    [y_re[:], y_im[:], l_im[:], l_re[:]])
                x_re = cx * y_re[:] - sx * gy_im
                x_im = cx * y_im[:] + sx * gy_re
                gx_re = cx * gy_re - sx * y_im[:]
                gx_im = cx * gy_im + sx * y_re[:]
                contrib = (l_re[:] * (-sx * x_re + cx * gx_im)
                           + l_im[:] * (-sx * x_im - cx * gx_re))
                nl_re = cx * l_re[:] - sx * gl_im
                nl_im = cx * l_im[:] + sx * gl_re
            elif kind == "y":  # Y: inverse = transpose = c I - s K
                ky_re, ky_im, kl_re, kl_im = g_multi(
                    [y_re[:], y_im[:], l_re[:], l_im[:]])
                x_re = cx * y_re[:] - sx * ky_re
                x_im = cx * y_im[:] - sx * ky_im
                gx_re = cx * ky_re + sx * y_re[:]
                gx_im = cx * ky_im + sx * y_im[:]
                contrib = (l_re[:] * (-sx * x_re + cx * gx_re)
                           + l_im[:] * (-sx * x_im + cx * gx_im))
                nl_re = cx * l_re[:] - sx * kl_re
                nl_im = cx * l_im[:] - sx * kl_im
            else:  # hop: see the unbatched backward kernel
                m = _hop_mask(y_re.shape, mask_spec)
                ct = 1.0 + m * (cx - 1.0)
                ty_re, ty_im, tl_im, tl_re = g_multi(
                    [y_re[:], y_im[:], l_im[:], l_re[:]])
                gy_re = m * ty_re
                gy_im = m * ty_im
                x_re = ct * y_re[:] - sx * gy_im
                x_im = ct * y_im[:] + sx * gy_re
                gx_re = cx * gy_re - sx * (m * y_im[:])
                gx_im = cx * gy_im + sx * (m * y_re[:])
                contrib = (l_re[:] * (-sx * (m * x_re) + cx * gx_im)
                           + l_im[:] * (-sx * (m * x_im) - cx * gx_re))
                nl_re = ct * l_re[:] - sx * (m * tl_im)
                nl_im = ct * l_im[:] + sx * (m * tl_re)
            # rank-2 all the way (Mosaic dislikes rank-1 intermediates);
            # b=1 reduces to a full scalar — the [1, r] intermediate trips
            # a Mosaic relayout bug
            if contrib.shape[0] == 1:
                g_rot[j] = jnp.sum(contrib)
            else:
                g_rot[j] = jnp.sum(jnp.sum(contrib, axis=2), axis=1,
                                   keepdims=True)  # [B, 1]
            y_re[:] = x_re
            y_im[:] = x_im
            l_re[:] = nl_re
            l_im[:] = nl_im

        def undo_phase():
            th = th_ref[0]
            c, s = jnp.cos(th), jnp.sin(th)
            g = l_re[:] * y_im[:] - l_im[:] * y_re[:]
            re = c * y_re[:] - s * y_im[:]
            im = s * y_re[:] + c * y_im[:]
            y_re[:] = re
            y_im[:] = im
            re = c * l_re[:] - s * l_im[:]
            im = s * l_re[:] + c * l_im[:]
            l_re[:] = re
            l_im[:] = im
            return g

        # merged-phase schedule (see _make_backward_kernel): the reversed
        # stage 0 reads the appended ZERO tx row, so its rotations are
        # exact identities and its gtx row lands in the discarded extra
        # output row (no pl.when — see _append_zero_row). unmerged
        # (n_steps == 1): trailing phase first, same th row twice.
        b = y_re.shape[0]
        g_trail = None if merged else undo_phase()
        for op in reversed(ops):
            undo_rot(op)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (b, _LANES), 1)
        row = jnp.zeros((b, _LANES), jnp.float32)
        for j, g in g_rot.items():
            row = jnp.where(lane_ids == j, g, row)  # g [B,1] broadcasts
        gtx_ref[0] = row

        g_lead = undo_phase()
        gth_ref[0] = g_lead if merged else g_trail + g_lead

        @pl.when(i == (n_steps if merged else n_steps - 1))
        def _():
            gp0_re[:] = l_re[:]
            gp0_im[:] = l_im[:]

    return kernel


def _pad_tx_b(theta_x: jnp.ndarray) -> jnp.ndarray:
    """[n_steps, B, n_x] → [n_steps, max(n_x,1), B, 1, 128] f32, each angle
    replicated along the lane axis so kernel reads are rank-3 blocks
    (Mosaic's layout inference rejects rank-1 intermediates). A zero-drive
    problem (diag-only, n_x = 0) still pads one slot: the kernel BlockSpecs
    index a size->=1 axis even though no rotation ever reads it."""
    n_steps, b, n_x = theta_x.shape
    if n_x == 0:
        return jnp.zeros((n_steps, 1, b, 1, _LANES), jnp.float32)
    t = jnp.moveaxis(theta_x.astype(jnp.float32), 2, 1)  # [T, n_x, B]
    return jnp.broadcast_to(t[:, :, :, None, None],
                            (n_steps, n_x, b, 1, _LANES))


def _bsflip_row(x: jnp.ndarray, bit: int) -> jnp.ndarray:
    """Signed pair-swap on [B, R, 128] (the Y 'K' operator, row qubit)."""
    nb, r, _ = x.shape
    hi = 2**bit
    lo = r // (hi * 2)
    y = x.reshape(nb, hi, 2, lo, _LANES)
    y = jnp.concatenate([-y[:, :, 1:2], y[:, :, 0:1]], axis=2)
    return y.reshape(nb, r, _LANES)


def _common_b(theta_half, x_qubits, kinds, n_qubits):
    kinds = kinds or ("x",) * len(x_qubits)
    n_steps, b, d = theta_half.shape
    r = d // _LANES
    ops, perms = _plan_ops(x_qubits, kinds, n_qubits)
    return n_steps, b, d, r, ops, perms


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_product_evolve_batched(psi0: CP, theta_half: jnp.ndarray,
                                 theta_x: jnp.ndarray, x_qubits: tuple,
                                 n_qubits: int, kinds: tuple = None,
                                 fast_math: bool = False) -> CP:
    """Batched fused evolution: psi0 CP [B, 2^n], theta_half
    [n_steps, B, 2^n], theta_x [n_steps, B, n_x] — per-seed pulses;
    kinds: per-rotation generator kind ('x' | 'y'), default all-X;
    fast_math: single-pass bf16 MXU matmuls (see :func:`_pdot`)."""
    return _forward_b(psi0, theta_half, theta_x, x_qubits, n_qubits, kinds,
                      fast_math)


def _forward_b(psi0, theta_half, theta_x, x_qubits, n_qubits, kinds=None,
               fast_math=False):
    n_steps, b, d, r, ops, perms = _common_b(
        theta_half, x_qubits, kinds, n_qubits)
    merged = n_steps > 1
    n_stages = n_steps + 1 if merged else n_steps
    th_op = merge_phase_rows(theta_half.astype(jnp.float32)) if merged \
        else theta_half.astype(jnp.float32)
    tx_op = _pad_tx_b(theta_x)
    if merged:
        tx_op = _append_zero_row(tx_op)
    kernel = _make_forward_kernel_b(n_steps, ops, fast_math, merged)
    n_x = max(theta_x.shape[2], 1)
    state_spec = pl.BlockSpec((b, r, _LANES), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(n_stages,),
        in_specs=[
            pl.BlockSpec((1, b, r, _LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_x, b, 1, _LANES),
                         lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            state_spec, state_spec,
            pl.BlockSpec(perms.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(state_spec, state_spec),
        out_shape=(jax.ShapeDtypeStruct((b, r, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((b, r, _LANES), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((b, r, _LANES), jnp.float32),
                        pltpu.VMEM((b, r, _LANES), jnp.float32)],
        interpret=(jax.default_backend() == "cpu"),
        **_vmem_params(10, b, r),
    )(th_op.reshape(n_stages, b, r, _LANES),
      tx_op,
      psi0.re.reshape(b, r, _LANES).astype(jnp.float32),
      psi0.im.reshape(b, r, _LANES).astype(jnp.float32),
      _as_perms_operand(perms))
    return CP(out_re.reshape(b, d), out_im.reshape(b, d))


def _fwd_b(psi0, theta_half, theta_x, x_qubits, n_qubits, kinds=None,
           fast_math=False):
    out = _forward_b(psi0, theta_half, theta_x, x_qubits, n_qubits, kinds,
                     fast_math)
    return out, (out, theta_half, theta_x)


def _bwd_b(x_qubits, n_qubits, kinds, fast_math, residuals, lam):
    psi_T, theta_half, theta_x = residuals
    n_steps, b, d, r, ops, perms = _common_b(
        theta_half, x_qubits, kinds, n_qubits)
    merged = n_steps > 1
    n_stages = n_steps + 1 if merged else n_steps
    th_op = merge_phase_rows(theta_half.astype(jnp.float32)) if merged \
        else theta_half.astype(jnp.float32)
    tx_op = _pad_tx_b(theta_x)
    if merged:
        tx_op = _append_zero_row(tx_op)
    kernel = _make_backward_kernel_b(n_steps, ops, fast_math, merged)
    n_x = max(theta_x.shape[2], 1)
    # merged grid: every operand spans T+1 stage rows (theta merged, tx
    # with an appended zero row; gth/gtx gain one discarded row) — all
    # index maps affine
    rev4 = lambda i: (n_stages - 1 - i, 0, 0, 0)  # noqa: E731
    rev3 = lambda i: (n_stages - 1 - i, 0, 0)  # noqa: E731
    rev5 = lambda i: (n_stages - 1 - i, 0, 0, 0, 0)  # noqa: E731
    state_spec = pl.BlockSpec((b, r, _LANES), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    gth, gtx, gp_re, gp_im = pl.pallas_call(
        kernel,
        grid=(n_stages,),
        in_specs=[
            pl.BlockSpec((1, b, r, _LANES), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_x, b, 1, _LANES), rev5,
                         memory_space=pltpu.VMEM),
            state_spec, state_spec, state_spec, state_spec,
            pl.BlockSpec(perms.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b, r, _LANES), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, _LANES), rev3, memory_space=pltpu.VMEM),
            state_spec, state_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_stages, b, r, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_stages, b, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, r, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, r, _LANES), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((b, r, _LANES), jnp.float32),
                        pltpu.VMEM((b, r, _LANES), jnp.float32),
                        pltpu.VMEM((b, r, _LANES), jnp.float32),
                        pltpu.VMEM((b, r, _LANES), jnp.float32)],
        interpret=(jax.default_backend() == "cpu"),
        # the streamed BATCHED backward's fixed demand crosses the 16 MiB
        # default past b*r ~ 2048 rows (chip-measured 46.78 MiB at
        # 16q x 8 trajectories - the fused-MCWF shape)
        **_vmem_params(14, b, r),
    )(th_op.reshape(n_stages, b, r, _LANES),
      tx_op,
      psi_T.re.reshape(b, r, _LANES).astype(jnp.float32),
      psi_T.im.reshape(b, r, _LANES).astype(jnp.float32),
      lam.re.reshape(b, r, _LANES).astype(jnp.float32),
      lam.im.reshape(b, r, _LANES).astype(jnp.float32),
      _as_perms_operand(perms))
    gth = gth.reshape(n_stages, b, d)
    if merged:
        gth = unmerge_phase_grads(gth)
    return (CP(gp_re.reshape(b, d), gp_im.reshape(b, d)),
            gth.astype(theta_half.dtype),
            gtx[:n_steps, :, :theta_x.shape[2]].astype(theta_x.dtype))


fused_product_evolve_batched.defvjp(_fwd_b, _bwd_b)


# ===========================================================================
# Packed-phase kernels: the diagonal phase is computed IN-KERNEL from a
# single int32 sign bit-plane + per-step control scalars, instead of
# streaming a precomputed [n_steps, (B,) d] angle table from HBM.
#
# Any diagonal control row that takes at most TWO distinct values
# decomposes as  row = c + w * s  with s ∈ {−1, +1} — Pauli-Z strings
# (ZZ couplers ±1), projectors/number operators (0/1), and Z drives all
# qualify. Bit k of the packed plane stores s_k(d) < 0; in-kernel
#     theta(d) = h0_half(d) + Σ_k a_k·s_k(d) + offset
# with a_k = dt/2·u_k(t)·w_k and offset = dt/2·Σ_k u_k(t)·c_k streamed as
# ≤ 128 scalars per step. Wins vs the streamed kernels:
#   - HBM traffic per step drops from 2 state-sized planes (read theta +
#     write d(theta)) to ~1 KB — the streamed tables were the dominant
#     bandwidth term (docs/PERFORMANCE.md roofline);
#   - the XLA-side [n_steps, d] table build + its [n_steps, d] gradient
#     chain disappear (the kernel returns [n_steps, n_diag+1] directly);
#   - backward VMEM drops by the 4 double-buffered table planes, and with
#     HBM-resident boundary buffers (manual DMA at the first/last grid
#     step) the whole-evolution kernel fits 18-19 qubits — past the
#     16 MiB wall that capped round 2 at 17 (docs/STATUS.md).
#
# The reference hits its scale wall at ~12-13 qubits from dense expm
# (`/root/reference/diffqc.cc:190-200`); this path trains 19 qubits in one
# fused kernel on one chip.
# ===========================================================================

_MAX_PACKED_TERMS = 120  # 4 int32 bit-planes x 30 bits each

# Mosaic's DEFAULT scoped-vmem window is 16 MiB, but the v5e core has
# ~128 MiB of physical VMEM (measured: 120 MiB of live pallas buffers
# compile and run; see docs/PERFORMANCE.md round 3). Raising
# vmem_limit_bytes is what lets the whole-evolution kernels carry 18+
# qubit states VMEM-resident. CAVEATS (all measured on the axon v5e):
# compile time grows dramatically with the window (110 MiB left the 18q
# backward compiling >45 min; 48 MiB compiles in ~4 min), and windows
# >= 64 MiB crash the remote compile helper outright — so 18q (40 MiB
# appetite) is the largest VMEM-resident size; 19+ qubits run on the
# chunked HBM-state engine instead (ops/fused_chunked.py).
_VMEM_HW_BYTES = 48 * 2**20
# Window-size experiment knobs, read ONCE at import: they reach the
# compiler through traced programs, so later env changes would be
# silently ignored by anything already jit-cached (ADVICE r4).
_VMEM_MIB_FWD = int(os.environ.get("DQ_VMEM_MIB_FWD", "28"))
_VMEM_MIB_BWD = int(os.environ.get("DQ_VMEM_MIB_BWD", "48"))


def _vmem_params(n_planes: int, b: int, r: int):
    """compiler_params kwargs for kernels whose working set may exceed the
    16 MiB default scoped window. Mosaic's own accounting (scratch +
    temporaries + double buffers) runs well past naive plane counts — the
    18q backward asks for 32 MiB — so any kernel touching >= 2048 total
    state rows (b*r, i.e. 18+ qubit states or large seed batches) simply
    gets the full measured hardware window."""
    if b * r < 2048:
        return {}
    # Round-4 on-chip findings (BENCH_r03 OOM + the 18q chained-scan test):
    # the FORWARD's scoped demand CHASES the window (44 MiB granted →
    # 45.06 MiB demanded; 28 → fits), while the BACKWARD-inside-a-scan
    # demands a FIXED amount regardless of the window (the 18q packed
    # backward: 42.62 MiB at both 28 and 40 MiB limits — the scan's
    # transpose fuses extra operands onto the kernel's stack; the
    # streamed batched backward at 16q x 8 trajectories: 46.78 MiB). So
    # the two roles need DIFFERENT windows: a modest one for the forward
    # (n_planes <= 10) and the full 48 MiB hardware-safe cap for the
    # backward (n_planes > 10). Env DQ_VMEM_MIB_FWD / DQ_VMEM_MIB_BWD
    # override for on-chip experiments — read ONCE at import (module
    # constants below): these values bake into traced/compiled programs,
    # so a mid-process change would silently not apply to anything
    # already jit-cached; set them before the first import instead.
    mib = _VMEM_MIB_FWD if n_planes <= 10 else _VMEM_MIB_BWD
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=int(min(mib * 2**20, _VMEM_HW_BYTES)))}


_PLANE_BITS = 30  # sign bits per int32 plane (sign bit + 1 kept clear)


def parity_sign_masks(diag_rows, cap_terms: bool = True):
    """Express each two-valued diagonal row as
    ``row_k(j) = c_k + w_k * (-1)^parity(j & m_k)`` — the form every
    Pauli-Z-string cost has (ZZ couplers, Z fields, their products).
    Returns ``(masks, consts, scales)`` with ``masks`` python ints, or
    None when some row is two-valued but not parity-form (then the dense
    :func:`pack_diag_signs` planes are the fallback).

    Why this exists: the dense sign planes are [P, 2^n] int32 trace-time
    constants — 4-16 MiB baked into the MLIR module at 20-24 qubits,
    slowing every compile and (measured, round 4) OOM-killing the remote
    compile helper on the 20q hop-mega program. Parity masks instead let
    :func:`signs_planes_device` rebuild the planes ON DEVICE from an
    iota, shrinking the serialized program to a few bit-ops."""
    rows = [np.asarray(r, dtype=np.float64) for r in diag_rows]
    if cap_terms and len(rows) > _MAX_PACKED_TERMS:
        return None
    if not rows:
        return ((), np.zeros(0), np.zeros(0))
    d = rows[0].shape[0]
    nbits = int(round(np.log2(d)))
    j = np.arange(d, dtype=np.int64)
    masks, consts, scales = [], [], []
    for row in rows:
        lo, hi = float(row.min()), float(row.max())
        c, w = 0.5 * (hi + lo), 0.5 * (hi - lo)
        if w == 0.0:
            masks.append(0)
            consts.append(c)
            scales.append(0.0)
            continue
        s = (row - c) / w
        if np.max(np.abs(np.abs(s) - 1.0)) > 1e-9:
            return None  # more than two distinct values
        neg = s < 0
        if neg[0]:  # parity(0 & m) = 0 ⇒ absorb a global flip into w
            w = -w
            neg = ~neg
        m = 0
        for b in range(nbits):
            if neg[1 << b]:
                m |= 1 << b
        x = j & m
        for sh in (32, 16, 8, 4, 2, 1):
            x ^= x >> sh
        if not np.array_equal((x & 1).astype(bool), neg):
            return None  # two-valued but not a parity function
        masks.append(m)
        consts.append(c)
        scales.append(w)
    return tuple(masks), np.asarray(consts), np.asarray(scales)


def parity_bit_device(j: jnp.ndarray, mask: int) -> jnp.ndarray:
    """parity(j & mask) as an int array built from shifts/xors on device."""
    x = jnp.bitwise_and(j, jnp.int32(mask))
    for sh in (16, 8, 4, 2, 1):
        x = jnp.bitwise_xor(x, jax.lax.shift_right_logical(x, np.int32(sh)))
    return jnp.bitwise_and(x, jnp.int32(1))


def diag_rows_device(diag_rows, d: int, rdt):
    """[n_rows, d] diagonal-control table, built ON DEVICE from parity
    masks when every row is parity-form (row = c + w·(-1)^parity(j&m) —
    every Pauli-Z-string cost). The host-side np.stack form serializes as
    a dense MLIR constant: 770 MB at 23 qubits × 23 ZZ rows, which the
    remote-compile tunnel rejects outright (HTTP 413, chip-measured
    round 4) — this keeps the XLA product engine shippable at frontier
    sizes. Non-parity rows fall back to the dense constant (unavoidable
    for genuinely unstructured diagonals)."""
    if not diag_rows:
        return jnp.zeros((0, d), dtype=rdt)
    par = parity_sign_masks(diag_rows, cap_terms=False)
    if par is None:
        return jnp.asarray(np.stack(diag_rows), dtype=rdt)
    masks, consts, scales = par
    j = jax.lax.iota(jnp.int32, d)
    rows = [jnp.full((d,), c, dtype=rdt) if w == 0.0 else
            (c + w * (1.0 - 2.0 * parity_bit_device(j, m).astype(rdt)))
            for m, c, w in zip(masks, consts, scales)]
    return jnp.stack(rows).astype(rdt)


def diag_vec_device(row, rdt):
    """Single diagonal as a device-built vector when parity-form (H0
    diagonals — typically all zeros or a Z-string sum); dense otherwise."""
    row = np.asarray(row)
    out = diag_rows_device([row], row.shape[0], rdt)
    return out[0]


def signs_planes_device(masks, d: int) -> jnp.ndarray:
    """[P, d] int32 sign bit-planes (bit k%30 of plane k//30 set ⇔
    row k's sign is −1 at that index) computed on device from an iota —
    the constant-free counterpart of :func:`pack_diag_signs`, bit-for-bit
    identical planes. Kernels consume either interchangeably."""
    if not masks:
        return jnp.zeros((1, d), jnp.int32)
    j = jax.lax.iota(jnp.int32, d)
    planes = []
    for p0 in range(0, len(masks), _PLANE_BITS):
        plane = jnp.zeros((d,), jnp.int32)
        for k, m in enumerate(masks[p0:p0 + _PLANE_BITS]):
            x = jnp.bitwise_and(j, jnp.int32(m))
            for sh in (16, 8, 4, 2, 1):
                x = jnp.bitwise_xor(
                    x, jax.lax.shift_right_logical(x, np.int32(sh)))
            plane = jnp.bitwise_or(
                plane, jax.lax.shift_left(jnp.bitwise_and(x, jnp.int32(1)),
                                          np.int32(k)))
        planes.append(plane)
    return jnp.stack(planes)


def pack_diag_signs(diag_rows):
    """Decompose two-valued diagonal rows as ``row_k = c_k + w_k * s_k``
    with s_k ∈ {−1, +1}; pack the signs bitwise into int32 bit-planes
    (plane k//30, bit k%30 set ⇔ s_k < 0). Returns
    (signs[P, d] int32, consts[n], scales[n]) with P = ceil(n/30) ≥ 1,
    or None if any row has >2 distinct values or n > 120. Multi-plane
    packing (round 4) is what admits molecule drive sets — a 20q chain
    has 37 ZZ couplers, past the single-int32 budget that capped round 3."""
    rows = [np.asarray(r, dtype=np.float64) for r in diag_rows]
    if len(rows) > _MAX_PACKED_TERMS:
        return None
    if not rows:
        return (np.zeros((1, 0), np.int32), np.zeros(0), np.zeros(0))
    d = rows[0].shape[0]
    n_planes = max(1, -(-len(rows) // _PLANE_BITS))
    signs = np.zeros((n_planes, d), np.int32)
    consts, scales = [], []
    for k, row in enumerate(rows):
        lo, hi = float(row.min()), float(row.max())
        c, w = 0.5 * (hi + lo), 0.5 * (hi - lo)
        if w == 0.0:
            s_neg = np.zeros(d, bool)
        else:
            s = (row - c) / w
            if np.max(np.abs(np.abs(s) - 1.0)) > 1e-9:
                return None  # more than two distinct values
            s_neg = s < 0
        consts.append(c)
        scales.append(w)
        signs[k // _PLANE_BITS] |= (s_neg.astype(np.int32)
                                    << (k % _PLANE_BITS))
    return signs, np.asarray(consts), np.asarray(scales)


def _theta_packed(ud_ref, h0th_ref, signs_ref, n_diag, b, r):
    """In-kernel per-step diagonal phase: [B, r, 128] from the packed sign
    bit-planes ([P, r, 128] int32, 30 terms per plane) and the stage's ≤126
    control scalars (slot n_diag = offset, slot n_diag+1 = the h0-drift
    multiplier — 1 for the boundary half-phases, 2 for cross-step merged
    interior phases; see :func:`_merge_ud_rows_b`)."""
    off = ud_ref[0, n_diag]  # [B, 1, 128] lane-replicated offset
    m = ud_ref[0, n_diag + 1]  # [B, 1, 128] h0 multiplier
    th = m * jnp.broadcast_to(h0th_ref[:][None], (b, r, _LANES)) + off
    for k in range(n_diag):
        p = signs_ref[k // _PLANE_BITS]  # [r, 128] int32
        a = ud_ref[0, k]  # [B, 1, 128]
        bit = jnp.bitwise_and(
            jax.lax.shift_right_logical(p, np.int32(k % _PLANE_BITS)),
            np.int32(1)).astype(jnp.float32)
        # a * s_k = a - 2 a bit
        th = th + a - (2.0 * a) * jnp.broadcast_to(bit[None],
                                                   (b, r, _LANES))
    return th


def _merge_ud_rows_b(ud: jnp.ndarray) -> jnp.ndarray:
    """Cross-step phase merge for the packed/in-kernel-phase form:
    [T, B, S] per-step scaled diag-control rows (slot S-1 = offset) →
    [T+1, B, S+1] merged-stage rows. Row 0 / row T carry the boundary
    half-phases (h0-multiplier slot = 1); interior row t carries the
    trailing half of step t-1 plus the leading half of step t (slot
    sums — the angle is linear in the row — with h0 multiplier 2).
    Same convention as the chunked engine's ``pad_row(..., extra=2.0)``
    (`fused_chunked.py::_setup`). Gradient transpose:
    :func:`unmerge_phase_grads` over the first S slots."""
    t = ud.shape[0]
    one = jnp.ones((1,) + ud.shape[1:-1] + (1,), jnp.float32)
    udf = ud.astype(jnp.float32)
    first = jnp.concatenate([udf[:1], one], -1)
    last = jnp.concatenate([udf[-1:], one], -1)
    if t == 1:
        # single step: leading and trailing half-phases stay separate
        return jnp.concatenate([first, last], 0)
    mid = jnp.concatenate(
        [udf[:-1] + udf[1:],
         jnp.broadcast_to(2.0 * one, (t - 1,) + one.shape[1:])], -1)
    return jnp.concatenate([first, mid, last], 0)


def _make_forward_kernel_pk(n_steps, ops, n_diag,
                            fast=False, dma_boundary=False):
    bflip = lambda v, b, _n: _bflip_row(v, b)       # noqa: E731
    bsflip = lambda v, b, _n: _bsflip_row(v, b)     # noqa: E731

    def kernel(ud_ref, tx_ref, h0th_ref, signs_ref, pin_re, pin_im,
               perms_ref, out_re, out_im, s_re, s_im, *sems):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            if dma_boundary:
                sem = sems[0]
                c1 = pltpu.make_async_copy(pin_re, s_re, sem.at[0])
                c2 = pltpu.make_async_copy(pin_im, s_im, sem.at[1])
                c1.start()
                c2.start()
                c1.wait()
                c2.wait()
            else:
                s_re[:] = pin_re[:]
                s_im[:] = pin_im[:]

        b, r = s_re.shape[0], s_re.shape[1]

        def phase():
            th = _theta_packed(ud_ref, h0th_ref, signs_ref, n_diag, b, r)
            c, s = jnp.cos(th), jnp.sin(th)
            re = c * s_re[:] + s * s_im[:]
            im = c * s_im[:] - s * s_re[:]
            s_re[:] = re
            s_im[:] = im

        def rot(op):
            (j, kind, _, _, mask_spec) = op
            g_multi = _op_generator_multi(op, perms_ref, 0, fast, bflip,
                                          bsflip, _blane_dot)
            th = tx_ref[0, j]  # [B, 1, 128]
            c, s = jnp.cos(th), jnp.sin(th)
            if kind == "x":
                g_im, g_re = g_multi([s_im[:], s_re[:]])
                re = c * s_re[:] + s * g_im
                im = c * s_im[:] - s * g_re
            elif kind == "y":
                g_re, g_im = g_multi([s_re[:], s_im[:]])
                re = c * s_re[:] + s * g_re
                im = c * s_im[:] + s * g_im
            else:  # hop: see the streamed batched kernel
                m = _hop_mask(s_re.shape, mask_spec)
                ct = 1.0 + m * (c - 1.0)
                g_im, g_re = g_multi([s_im[:], s_re[:]])
                re = ct * s_re[:] + s * (m * g_im)
                im = ct * s_im[:] - s * (m * g_re)
            s_re[:] = re
            s_im[:] = im

        phase()
        # stage n_steps reads the appended ZERO tx row — exact identity
        # rotations, no pl.when gate (see _append_zero_row)
        for op in ops:
            rot(op)

        @pl.when(i == n_steps)
        def _():
            if dma_boundary:
                sem = sems[0]
                c1 = pltpu.make_async_copy(s_re, out_re, sem.at[2])
                c2 = pltpu.make_async_copy(s_im, out_im, sem.at[3])
                c1.start()
                c2.start()
                c1.wait()
                c2.wait()
            else:
                out_re[:] = s_re[:]
                out_im[:] = s_im[:]

    return kernel


def _make_backward_kernel_pk(n_steps, ops, n_diag,
                             fast=False, dma_boundary=False):
    """Packed-phase adjoint: reconstructs the state by inverting each op
    (O(1) memory in n_steps); per-step diag gradients are reduced in-kernel
    to the ≤128 control scalars (no [n_steps, d] gradient stream)."""
    bflip = lambda v, b, _n: _bflip_row(v, b)       # noqa: E731
    bsflip = lambda v, b, _n: _bsflip_row(v, b)     # noqa: E731

    def kernel(ud_ref, tx_ref, h0th_ref, signs_ref, pT_re, pT_im,
               lamT_re, lamT_im, perms_ref, gud_ref, gtx_ref,
               gp0_re, gp0_im, y_re, y_im, l_re, l_im, *sems):
        i = pl.program_id(0)  # i-th reversed step

        @pl.when(i == 0)
        def _():
            if dma_boundary:
                sem = sems[0]
                cps = [pltpu.make_async_copy(pT_re, y_re, sem.at[0]),
                       pltpu.make_async_copy(pT_im, y_im, sem.at[1]),
                       pltpu.make_async_copy(lamT_re, l_re, sem.at[2]),
                       pltpu.make_async_copy(lamT_im, l_im, sem.at[3])]
                for c in cps:
                    c.start()
                for c in cps:
                    c.wait()
            else:
                y_re[:] = pT_re[:]
                y_im[:] = pT_im[:]
                l_re[:] = lamT_re[:]
                l_im[:] = lamT_im[:]

        b, r = y_re.shape[0], y_re.shape[1]

        def red(v):  # [B, r, 128] → per-seed scalars
            if v.shape[0] == 1:
                # b=1: a full scalar reduce — the [1, r] intermediate of
                # the two-stage reduction trips a Mosaic relayout bug
                # ("non-singleton dimension replicated in destination")
                return jnp.sum(v)
            return jnp.sum(jnp.sum(v, axis=2), axis=1, keepdims=True)

        # per-term diag-gradient cells ([B,1] each), ONE merged phase
        # per stage: gud[k] = S0 − 2·Σ(gth·bit_k), offset slot = S0
        g_bits = [None] * n_diag
        g_s0 = [None]

        def undo_phase():
            th = _theta_packed(ud_ref, h0th_ref, signs_ref, n_diag, b, r)
            c, s = jnp.cos(th), jnp.sin(th)
            # dL/dth at the OUTPUT side of the phase op
            gth = l_re[:] * y_im[:] - l_im[:] * y_re[:]
            s0 = red(gth)
            g_s0[0] = s0 if g_s0[0] is None else g_s0[0] + s0
            for k in range(n_diag):
                bit = jnp.bitwise_and(
                    jax.lax.shift_right_logical(
                        signs_ref[k // _PLANE_BITS],
                        np.int32(k % _PLANE_BITS)),
                    np.int32(1)).astype(jnp.float32)
                sk = red(gth * jnp.broadcast_to(bit[None], (b, r, _LANES)))
                g_bits[k] = sk if g_bits[k] is None else g_bits[k] + sk
            # x = e^{+i th} y ; lam_x = e^{+i th} lam_y
            re = c * y_re[:] - s * y_im[:]
            im = s * y_re[:] + c * y_im[:]
            y_re[:] = re
            y_im[:] = im
            re = c * l_re[:] - s * l_im[:]
            im = s * l_re[:] + c * l_im[:]
            l_re[:] = re
            l_im[:] = im

        g_rot = {}

        def undo_rot(op):
            # G(x) derived from G(y) via G^2 = I / K^2 = -I: 4 generator
            # applications per rotation instead of 6, all four packed
            # into ONE lane matmul.
            (j, kind, _, _, mask_spec) = op
            g_multi = _op_generator_multi(op, perms_ref, 0, fast, bflip,
                                          bsflip, _blane_dot)
            thx = tx_ref[0, j]  # [B, 1, 128]
            cx, sx = jnp.cos(thx), jnp.sin(thx)
            if kind == "x":
                gy_re, gy_im, gl_im, gl_re = g_multi(
                    [y_re[:], y_im[:], l_im[:], l_re[:]])
                x_re = cx * y_re[:] - sx * gy_im
                x_im = cx * y_im[:] + sx * gy_re
                gx_re = cx * gy_re - sx * y_im[:]
                gx_im = cx * gy_im + sx * y_re[:]
                contrib = (l_re[:] * (-sx * x_re + cx * gx_im)
                           + l_im[:] * (-sx * x_im - cx * gx_re))
                nl_re = cx * l_re[:] - sx * gl_im
                nl_im = cx * l_im[:] + sx * gl_re
            elif kind == "y":  # inverse = transpose = c I − s K
                ky_re, ky_im, kl_re, kl_im = g_multi(
                    [y_re[:], y_im[:], l_re[:], l_im[:]])
                x_re = cx * y_re[:] - sx * ky_re
                x_im = cx * y_im[:] - sx * ky_im
                gx_re = cx * ky_re + sx * y_re[:]
                gx_im = cx * ky_im + sx * y_im[:]
                contrib = (l_re[:] * (-sx * x_re + cx * gx_re)
                           + l_im[:] * (-sx * x_im + cx * gx_im))
                nl_re = cx * l_re[:] - sx * kl_re
                nl_im = cx * l_im[:] - sx * kl_im
            else:  # hop: see the streamed batched backward kernel
                m = _hop_mask(y_re.shape, mask_spec)
                ct = 1.0 + m * (cx - 1.0)
                ty_re, ty_im, tl_im, tl_re = g_multi(
                    [y_re[:], y_im[:], l_im[:], l_re[:]])
                gy_re = m * ty_re
                gy_im = m * ty_im
                x_re = ct * y_re[:] - sx * gy_im
                x_im = ct * y_im[:] + sx * gy_re
                gx_re = cx * gy_re - sx * (m * y_im[:])
                gx_im = cx * gy_im + sx * (m * y_re[:])
                contrib = (l_re[:] * (-sx * (m * x_re) + cx * gx_im)
                           + l_im[:] * (-sx * (m * x_im) - cx * gx_re))
                nl_re = ct * l_re[:] - sx * (m * tl_im)
                nl_im = ct * l_im[:] + sx * (m * tl_re)
            g_rot[j] = red(contrib)
            y_re[:] = x_re
            y_im[:] = x_im
            l_re[:] = nl_re
            l_im[:] = nl_im

        # merged-phase schedule (see _make_backward_kernel): the reversed
        # stage 0 reads the appended ZERO tx row, so its rotations are
        # exact identities and its gtx row lands in the discarded extra
        # output row (no pl.when — see _append_zero_row)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (b, _LANES), 1)
        for op in reversed(ops):
            undo_rot(op)
        rrow = jnp.zeros((b, _LANES), jnp.float32)
        for j, g in g_rot.items():
            rrow = jnp.where(lane_ids == j, g, rrow)
        gtx_ref[0] = rrow

        undo_phase()  # the (merged) stage phase — exactly one per stage

        row = jnp.zeros((b, _LANES), jnp.float32)
        s0 = g_s0[0]
        for k in range(n_diag):
            row = jnp.where(lane_ids == k, s0 - 2.0 * g_bits[k], row)
        row = jnp.where(lane_ids == n_diag, s0, row)
        gud_ref[0] = row

        @pl.when(i == n_steps)
        def _():
            if dma_boundary:
                sem = sems[0]
                c1 = pltpu.make_async_copy(l_re, gp0_re, sem.at[0])
                c2 = pltpu.make_async_copy(l_im, gp0_im, sem.at[1])
                c1.start()
                c2.start()
                c1.wait()
                c2.wait()
            else:
                gp0_re[:] = l_re[:]
                gp0_im[:] = l_im[:]

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_product_evolve_packed(psi0: CP, ud: jnp.ndarray,
                                theta_x: jnp.ndarray, h0th: jnp.ndarray,
                                signs: jnp.ndarray, x_qubits: tuple,
                                n_qubits: int, kinds: tuple = None,
                                fast_math: bool = False) -> CP:
    """Fused evolution with IN-KERNEL diagonal phases (packed-sign form).

    psi0: CP [B, 2^n]; ud: [n_steps, B, n_diag+1] per-step scaled diag
    controls (slot k = dt/2·u_k·w_k, last slot = the scalar offset
    dt/2·Σ u_k·c_k); theta_x: [n_steps, B, n_x] rotation angles; h0th:
    [2^n] f32 drift half-angles dt/2·h0 (constant per problem, zero
    cotangent); signs: [P, 2^n] int32 packed sign bit-planes from
    :func:`pack_diag_signs` (integer — float0 cotangent)."""
    return _forward_pk(psi0, ud, theta_x, h0th, signs, x_qubits, n_qubits,
                       kinds, fast_math)


def _pk_common(ud, theta_x, x_qubits, kinds, n_qubits):
    kinds = kinds or ("x",) * len(x_qubits)
    n_steps, b, n_slots = ud.shape
    # ordered op plan (sequence order preserved — hops do not commute
    # with same-site 1q rotations), exactly like the streamed kernels
    ops, perms = _plan_ops(x_qubits, kinds, n_qubits)
    return n_steps, b, n_slots - 1, ops, perms


def _forward_pk(psi0, ud, theta_x, h0th, signs, x_qubits, n_qubits,
                kinds=None, fast_math=False):
    n_steps, b, n_diag, ops, perms = _pk_common(
        ud, theta_x, x_qubits, kinds, n_qubits)
    d = h0th.shape[-1]
    r = d // _LANES
    interp = jax.default_backend() == "cpu"
    dma = n_qubits >= 18 and not interp
    kernel = _make_forward_kernel_pk(n_steps, ops, n_diag,
                                     fast_math, dma)
    n_x = max(theta_x.shape[2], 1)
    bspace = pl.ANY if dma else pltpu.VMEM
    state_spec = pl.BlockSpec((b, r, _LANES), lambda i: (0, 0, 0),
                              memory_space=bspace)
    scratch = [pltpu.VMEM((b, r, _LANES), jnp.float32),
               pltpu.VMEM((b, r, _LANES), jnp.float32)]
    if dma:
        scratch.append(pltpu.SemaphoreType.DMA((4,)))
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(n_steps + 1,),
        in_specs=[
            pl.BlockSpec((1, n_diag + 2, b, 1, _LANES),
                         lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_x, b, 1, _LANES),
                         lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((signs.shape[0], r, _LANES),
                         lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            state_spec, state_spec,
            pl.BlockSpec(perms.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(state_spec, state_spec),
        out_shape=(jax.ShapeDtypeStruct((b, r, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((b, r, _LANES), jnp.float32)),
        scratch_shapes=scratch,
        interpret=interp,
        **_vmem_params(6 if dma else 10, b, r),
    )(_pad_tx_b(_merge_ud_rows_b(ud)),
      _append_zero_row(_pad_tx_b(theta_x)),
      h0th.reshape(r, _LANES).astype(jnp.float32),
      signs.reshape(signs.shape[0], r, _LANES),
      psi0.re.reshape(b, r, _LANES).astype(jnp.float32),
      psi0.im.reshape(b, r, _LANES).astype(jnp.float32),
      _as_perms_operand(perms))
    return CP(out_re.reshape(b, d), out_im.reshape(b, d))


def _fwd_pk(psi0, ud, theta_x, h0th, signs, x_qubits, n_qubits, kinds=None,
            fast_math=False):
    out = _forward_pk(psi0, ud, theta_x, h0th, signs, x_qubits, n_qubits,
                      kinds, fast_math)
    return out, (out, ud, theta_x, h0th, signs)


def _bwd_pk(x_qubits, n_qubits, kinds, fast_math, residuals, lam):
    psi_T, ud, theta_x, h0th, signs = residuals
    n_steps, b, n_diag, ops, perms = _pk_common(
        ud, theta_x, x_qubits, kinds, n_qubits)
    d = h0th.shape[-1]
    r = d // _LANES
    interp = jax.default_backend() == "cpu"
    dma = n_qubits >= 18 and not interp
    kernel = _make_backward_kernel_pk(n_steps, ops, n_diag,
                                      fast_math, dma)
    n_x = max(theta_x.shape[2], 1)
    # merged grid: every operand spans T+1 stage rows (ud merged, tx with
    # an appended zero row; gud/gtx gain one discarded row) — all index
    # maps affine
    rev5 = lambda i: (n_steps - i, 0, 0, 0, 0)  # noqa: E731
    rev3 = lambda i: (n_steps - i, 0, 0)  # noqa: E731
    bspace = pl.ANY if dma else pltpu.VMEM
    state_spec = pl.BlockSpec((b, r, _LANES), lambda i: (0, 0, 0),
                              memory_space=bspace)
    scratch = [pltpu.VMEM((b, r, _LANES), jnp.float32),
               pltpu.VMEM((b, r, _LANES), jnp.float32),
               pltpu.VMEM((b, r, _LANES), jnp.float32),
               pltpu.VMEM((b, r, _LANES), jnp.float32)]
    if dma:
        scratch.append(pltpu.SemaphoreType.DMA((4,)))
    gud, gtx, gp_re, gp_im = pl.pallas_call(
        kernel,
        grid=(n_steps + 1,),
        in_specs=[
            pl.BlockSpec((1, n_diag + 2, b, 1, _LANES), rev5,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_x, b, 1, _LANES), rev5,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((signs.shape[0], r, _LANES),
                         lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            state_spec, state_spec, state_spec, state_spec,
            pl.BlockSpec(perms.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b, _LANES), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, _LANES), rev3, memory_space=pltpu.VMEM),
            state_spec, state_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_steps + 1, b, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_steps + 1, b, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, r, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, r, _LANES), jnp.float32),
        ),
        scratch_shapes=scratch,
        interpret=interp,
        **_vmem_params(12 if dma else 18, b, r),
    )(_pad_tx_b(_merge_ud_rows_b(ud)),
      _append_zero_row(_pad_tx_b(theta_x)),
      h0th.reshape(r, _LANES).astype(jnp.float32),
      signs.reshape(signs.shape[0], r, _LANES),
      psi_T.re.reshape(b, r, _LANES).astype(jnp.float32),
      psi_T.im.reshape(b, r, _LANES).astype(jnp.float32),
      lam.re.reshape(b, r, _LANES).astype(jnp.float32),
      lam.im.reshape(b, r, _LANES).astype(jnp.float32),
      _as_perms_operand(perms))
    return (CP(gp_re.reshape(b, d), gp_im.reshape(b, d)),
            unmerge_phase_grads(gud)[:, :, :ud.shape[2]].astype(ud.dtype),
            gtx[:n_steps, :, :theta_x.shape[2]].astype(theta_x.dtype),
            jnp.zeros_like(h0th),
            np.zeros(signs.shape, dtype=jax.dtypes.float0))


fused_product_evolve_packed.defvjp(_fwd_pk, _bwd_pk)


def fused_rot_block(psi: CP, theta_x: jnp.ndarray, x_qubits: tuple,
                    n_qubits: int, kinds: tuple = None,
                    fast_math: bool = False) -> CP:
    """One Strang ROTATION block (no diagonal phase) as a single fused
    kernel call — the per-step local workhorse of the sharded engine
    (:mod:`...parallel.sharded_state`), which applies diagonal phases and
    distributed-qubit mixes in XLA (elementwise + ppermute) between kernel
    launches. Implemented as the whole-evolution kernel with n_steps=1 and a
    zero phase table, so the exact custom-VJP adjoint is reused unchanged.

    psi: CP [2^n] or batched CP [B, 2^n] (per-batch angles);
    theta_x: [n_x] or [B, n_x] matching.
    """
    kinds = tuple(kinds) if kinds else None
    if psi.ndim == 1:
        th = jnp.zeros((1,) + psi.shape[-1:], jnp.float32)
        return fused_product_evolve(psi, th,
                                    theta_x[None].astype(jnp.float32),
                                    tuple(x_qubits), n_qubits, kinds,
                                    fast_math)
    th = jnp.zeros((1,) + psi.shape, jnp.float32)
    return fused_product_evolve_batched(psi, th,
                                        theta_x[None].astype(jnp.float32),
                                        tuple(x_qubits), n_qubits, kinds,
                                        fast_math)
