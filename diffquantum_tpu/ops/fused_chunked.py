"""Chunked HBM-state fused evolution: 20+ qubits on one chip.

The whole-evolution kernels (:mod:`.fused_product`) keep the state resident
in VMEM — a hard wall at 19 qubits (state + adjoint + temporaries vs the
~16 MiB budget). This engine keeps the state in HBM as a ``[C, F, 128]``
array (C = 2^c chunk rows = the TOP c row bits, F = 2^f free rows) and
streams VMEM-sized slabs through two Pallas passes per Strang step:

- **pass A** — grid over the C axis, blocks ``[1, F, 128]``: diagonal
  phases (computed IN-KERNEL from the packed sign bit-plane, exactly as the
  packed VMEM kernels do) + rotations on free row bits and lane bits;
- **pass B** — grid over F-axis slices, blocks ``[C, Bf, 128]``: rotations
  on the chunk bits. A block holds ALL chunk-row values for a slice of free
  rows, so chunk-bit pair mixes are block-local — no transposes, no
  host round-trips.

Regrouping rotations between the passes is exact: rotations on distinct
qubits commute, and the palindromic same-qubit pairs stay within one pass
(same argument as the row/lane partition of the VMEM kernels). Adjacent
half-phases merge for free — exp(-i th_t)·exp(-i th_{t+1}) needs only the
SUM of the per-step control scalars, since the in-kernel phase is linear in
them — so the steady state costs exactly one A pass + one B pass per step
(2 state read+writes of HBM traffic).

The backward pass mirrors the structure with the O(1)-memory adjoint of the
VMEM kernels: the state is reconstructed by inverting each pass while the
cotangent evolves alongside it, and the per-step gradients are reduced
in-kernel to the ≤128 control scalars (accumulated across chunk
iterations).

The reference's dense-expm propagator stops near 12-13 qubits on any
hardware (`/root/reference/diffqc.cc:190-200`, O(4^n) matrices); the
round-2 XLA product path reached 20 qubits but crashed the TPU worker in
50-epoch compiled blocks. This engine trains 19-24 qubits with bounded
VMEM (~a dozen 0.5 MiB slabs); measured per 30-step value+grad chain:
20q 55.8 ms, 22q 145.6 ms, 23q 275.9 ms, 24q 561.6 ms (VPU-bound —
HBM traffic is ~10% of peak; clean 2x-per-qubit scaling).

Two executable forms, same math (shared compute cores, parity-tested):

- per-call (:func:`chunked_evolve`) — two pallas_calls per Strang step,
  Mosaic auto-pipelines the slab copies;
- mega (:func:`chunked_evolve_mega`) — the WHOLE chain (and the whole
  adjoint) as one pallas_call with explicit in-kernel DMA. Same on-chip
  step latency (20q grad 55.8 vs 57.3 ms at 30 steps), ~20x faster to
  COMPILE (20q forward 36 s vs 724 s; compile time is the binding
  constraint on this toolchain) — the production router uses this form.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cpx import CP
from .fused_product import (_PLANE_BITS, _as_perms_operand,
                            _multi_dot, _multi_map, _pdot, _perm_stack,
                            _split_qubits)

_LANES = 128
_LANE_QUBITS = 7
_F_BITS = 10  # free row bits per pass-A slab: 2^10 x 128 x 4 B = 0.5 MiB
# NOTE: 0.5 MiB slabs + Mosaic's default 16 MiB window are the PROVEN
# configuration (19-22q compile in minutes and run correctly on chip).
# Doubling the slab to 1 MiB with a 40 MiB window left the 21q backward
# compiling for >30 min — compile time, not runtime, is the binding
# constraint on this toolchain, so keep the slabs small.
_CK_VMEM = {}


def _mega_vmem(c: int) -> dict:
    """compiler_params for the mega kernels: the default 16 MiB scoped
    window fits through c = 5 (22q); at c >= 6 (23/24q) the backward's
    DMA slabs + accumulators overrun it (BENCH_r03: 18q packed backward
    42.62 vs 40 MiB; BENCH_r04: 24q mega backward 24.74 vs 24.00 MiB —
    the same regression class two rounds running), so grant generous
    headroom: the measured compile-time curve is flat through 48 MiB
    (docs/STATUS.md round-3 facts), and tpu_tests now carries 23q/24q
    chained-scan grad lane tests so window regressions can't ship
    silently again."""
    if c < 6:
        return dict(_CK_VMEM)
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=32 * 2**20)}


def _plan(n_qubits: int):
    """(c, f): chunk row bits (top) and free row bits."""
    row_bits = n_qubits - _LANE_QUBITS
    f = min(row_bits, _F_BITS)
    c = row_bits - f
    if c > _F_BITS - 3:  # pass-B block [2^c, Bf, 128] needs Bf >= 8
        raise ValueError(f"chunked engine supports up to "
                         f"{_LANE_QUBITS + _F_BITS + _F_BITS - 3} qubits, "
                         f"got {n_qubits}")
    return c, f


def _partition_rots(x_qubits, kinds, n_qubits, c):
    """Split rotations into (chunk_rots, free_rots, lane_rots) preserving
    order within each group; j = original index into the theta_x row."""
    rows, lanes = _split_qubits(x_qubits, kinds, n_qubits)
    chunk = [(j, q, kd) for (j, q, kd) in rows if q < c]
    free = [(j, q, kd) for (j, q, kd) in rows if q >= c]
    return chunk, free, lanes


def _flip2(x, hi, axis_len, tail_shape, sign=False):
    """Pair-swap the bit with ``hi`` blocks above it on the leading axis of
    ``x`` (shape [axis_len, *tail]); sign=True negates the upper half into
    the lower (the Y 'K' operator)."""
    lo = axis_len // (hi * 2)
    y = x.reshape((hi, 2, lo) + tail_shape)
    top = -y[:, 1:2] if sign else y[:, 1:2]
    y = jnp.concatenate([top, y[:, 0:1]], axis=1)
    return y.reshape((axis_len,) + tail_shape)


def _theta_row(ud_row, h0_blk, signs_blk, n_diag):
    """Per-slab diagonal phase from a [1, 128] angle row: layout =
    [a_0..a_{n_diag-1}, offset, h0_mult]; signs_blk is the [P, F, 128]
    packed sign bit-plane slab (30 terms per int32 plane). Returns the
    slab's 2-D shape."""
    off = ud_row[0, n_diag]
    mult = ud_row[0, n_diag + 1]
    th = mult * h0_blk + off
    for k in range(n_diag):
        a = ud_row[0, k]
        bit = jnp.bitwise_and(
            jax.lax.shift_right_logical(signs_blk[k // _PLANE_BITS],
                                        np.int32(k % _PLANE_BITS)),
            np.int32(1)).astype(jnp.float32)
        th = th + a - (2.0 * a) * bit
    return th


# ---------------------------------------------------------------------------
# shared compute cores (pure array -> array; used by both the per-call
# kernels and the single-call mega kernels)
# ---------------------------------------------------------------------------

def _a_fwd_core(re, im, ud_row, tx_row, h0_blk, sg_blk, perms_ref,
                free_rots, lane_rots, n_diag, c, fdim, fast):
    """Pass A step on one chunk slab: diagonal phase (in-kernel packed
    form) + free-row-bit and lane-bit rotations. Rows are [1, 128]."""
    th = _theta_row(ud_row, h0_blk, sg_blk, n_diag)
    cph, sph = jnp.cos(th), jnp.sin(th)
    re, im = cph * re + sph * im, cph * im - sph * re

    def rot(j, kind, g_multi, re, im):
        thx = tx_row[0, j]
        cx, sx = jnp.cos(thx), jnp.sin(thx)
        if kind == "x":
            g_im, g_re = g_multi([im, re])
            return (cx * re + sx * g_im, cx * im - sx * g_re)
        g_re, g_im = g_multi([re, im])
        return (cx * re + sx * g_re, cx * im + sx * g_im)

    for (j, q, kind) in free_rots:
        lb = q - c  # local bit on the F axis (0 = MSB)
        re, im = rot(j, kind,
                     _multi_map(lambda v, lb=lb, kd=kind: _flip2(
                         v, 2**lb, fdim, (_LANES,), sign=(kd == "y"))),
                     re, im)
    for li, (j, q, kind) in enumerate(lane_rots):
        re, im = rot(j, kind, _multi_dot(perms_ref[li], _pdot, fast),
                     re, im)
    return re, im


def _b_fwd_core(re, im, tx_row, chunk_rots, cdim, fast):
    """Pass B step on one [C, Bf, 128] block: chunk-bit rotations."""
    tail = re.shape[1:]
    for (j, q, kind) in chunk_rots:
        thx = tx_row[0, j]
        cx, sx = jnp.cos(thx), jnp.sin(thx)

        def g_of(v, q=q, kd=kind):
            return _flip2(v, 2**q, cdim, tail, sign=(kd == "y"))

        if kind == "x":
            re, im = (cx * re + sx * g_of(im), cx * im - sx * g_of(re))
        else:
            re, im = (cx * re + sx * g_of(re), cx * im + sx * g_of(im))
    return re, im


def _flip_multi(q, cdim, tail, kind):
    """Per-plane chunk/free-bit flip as a multi-apply (no matmul to pack)."""
    return _multi_map(
        lambda v: _flip2(v, 2**q, cdim, tail, sign=(kind == "y")))


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------

def _make_passA_fwd(free_rots, lane_rots, n_diag, c, f, fast):
    fdim = 2**f

    def kernel(ud_ref, tx_ref, h0_ref, sg_ref, in_re, in_im, perms_ref,
               out_re, out_im):
        re, im = _a_fwd_core(in_re[0], in_im[0], ud_ref[0], tx_ref[0],
                             h0_ref[0], sg_ref[0], perms_ref, free_rots,
                             lane_rots, n_diag, c, fdim, fast)
        out_re[0] = re
        out_im[0] = im

    return kernel


def _make_passB_fwd(chunk_rots, c, fast):
    cdim = 2**c

    def kernel(tx_ref, in_re, in_im, out_re, out_im):
        re, im = _b_fwd_core(in_re[:], in_im[:], tx_ref[0], chunk_rots,
                             cdim, fast)
        out_re[:] = re
        out_im[:] = im

    return kernel


# ---------------------------------------------------------------------------
# backward kernels: reconstruct x by inversion, evolve lam, reduce grads
# ---------------------------------------------------------------------------

def _undo_rot_core(thx, kind, g_multi, y_re, y_im, l_re, l_im):
    """Invert one rotation, evolve the cotangent, and return the angle
    gradient's elementwise integrand. G(x) is derived algebraically from
    the already-computed G(y): G^2 = I (X flips/XOR perms) and K^2 = -I
    (Y), so each rotation needs 4 generator applications instead of 6
    (see fused_product) — and all four ride ONE packed lane matmul."""
    cx, sx = jnp.cos(thx), jnp.sin(thx)
    if kind == "x":
        gy_re, gy_im, gl_im, gl_re = g_multi([y_re, y_im, l_im, l_re])
        x_re = cx * y_re - sx * gy_im
        x_im = cx * y_im + sx * gy_re
        gx_re = cx * gy_re - sx * y_im
        gx_im = cx * gy_im + sx * y_re
        contrib = (l_re * (-sx * x_re + cx * gx_im)
                   + l_im * (-sx * x_im - cx * gx_re))
        nl_re = cx * l_re - sx * gl_im
        nl_im = cx * l_im + sx * gl_re
    else:
        ky_re, ky_im, kl_re, kl_im = g_multi([y_re, y_im, l_re, l_im])
        x_re = cx * y_re - sx * ky_re
        x_im = cx * y_im - sx * ky_im
        gx_re = cx * ky_re + sx * y_re
        gx_im = cx * ky_im + sx * y_im
        contrib = (l_re * (-sx * x_re + cx * gx_re)
                   + l_im * (-sx * x_im + cx * gx_im))
        nl_re = cx * l_re - sx * kl_re
        nl_im = cx * l_im - sx * kl_im
    return x_re, x_im, nl_re, nl_im, contrib


def _a_bwd_core(y_re, y_im, l_re, l_im, ud_row, tx_row, h0_blk, sg_blk,
                perms_ref, free_rots, lane_rots, n_diag, c, fdim, fast):
    """Pass A inverse on one chunk slab: undo rotations (lanes then free
    rows), then the phase; reduce diag and rotation gradients to per-term
    scalars. Returns (y_re, y_im, l_re, l_im, gud_row, gtx_row)."""
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    g_rot = {}

    def undo(j, kind, g_multi, y_re, y_im, l_re, l_im):
        y_re, y_im, l_re, l_im, contrib = _undo_rot_core(
            tx_row[0, j], kind, g_multi, y_re, y_im, l_re, l_im)
        g_rot[j] = jnp.sum(contrib)
        return y_re, y_im, l_re, l_im

    # undo rotations (reverse forward order: lanes then free rows)
    for li in range(len(lane_rots) - 1, -1, -1):
        j, q, kind = lane_rots[li]
        y_re, y_im, l_re, l_im = undo(
            j, kind, _multi_dot(perms_ref[li], _pdot, fast),
            y_re, y_im, l_re, l_im)
    for (j, q, kind) in reversed(free_rots):
        y_re, y_im, l_re, l_im = undo(
            j, kind, _flip_multi(q - c, fdim, (_LANES,), kind),
            y_re, y_im, l_re, l_im)

    # undo the phase; diag gradients reduced to per-term scalars
    th = _theta_row(ud_row, h0_blk, sg_blk, n_diag)
    cph, sph = jnp.cos(th), jnp.sin(th)
    gth = l_re * y_im - l_im * y_re
    s0 = jnp.sum(gth)
    row = jnp.zeros((1, _LANES), jnp.float32)
    for k in range(n_diag):
        bit = jnp.bitwise_and(
            jax.lax.shift_right_logical(sg_blk[k // _PLANE_BITS],
                                        np.int32(k % _PLANE_BITS)),
            np.int32(1)).astype(jnp.float32)
        sk = jnp.sum(gth * bit)
        row = jnp.where(lane_ids == k, s0 - 2.0 * sk, row)
    row = jnp.where(lane_ids == n_diag, s0, row)

    ny_re = cph * y_re - sph * y_im
    ny_im = sph * y_re + cph * y_im
    nl_re = cph * l_re - sph * l_im
    nl_im = sph * l_re + cph * l_im

    rrow = jnp.zeros((1, _LANES), jnp.float32)
    for j, g in g_rot.items():
        rrow = jnp.where(lane_ids == j, g, rrow)
    return ny_re, ny_im, nl_re, nl_im, row, rrow


def _b_bwd_core(y_re, y_im, l_re, l_im, tx_row, chunk_rots, cdim, fast):
    """Pass B inverse on one [C, Bf, 128] block. Returns
    (y_re, y_im, l_re, l_im, gtx_row)."""
    tail = y_re.shape[1:]
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    rrow = jnp.zeros((1, _LANES), jnp.float32)
    for (j, q, kind) in reversed(chunk_rots):
        y_re, y_im, l_re, l_im, contrib = _undo_rot_core(
            tx_row[0, j], kind, _flip_multi(q, cdim, tail, kind),
            y_re, y_im, l_re, l_im)
        rrow = rrow + jnp.where(lane_ids == j, jnp.sum(contrib), 0.0)
    return y_re, y_im, l_re, l_im, rrow


def _make_passA_bwd(free_rots, lane_rots, n_diag, c, f, fast):
    fdim = 2**f

    def kernel(ud_ref, tx_ref, h0_ref, sg_ref, y_re_i, y_im_i, l_re_i,
               l_im_i, perms_ref, y_re_o, y_im_o, l_re_o, l_im_o,
               gud_ref, gtx_ref):
        i = pl.program_id(0)
        y_re, y_im, l_re, l_im, row, rrow = _a_bwd_core(
            y_re_i[0], y_im_i[0], l_re_i[0], l_im_i[0], ud_ref[0],
            tx_ref[0], h0_ref[0], sg_ref[0], perms_ref, free_rots,
            lane_rots, n_diag, c, fdim, fast)
        y_re_o[0] = y_re
        y_im_o[0] = y_im
        l_re_o[0] = l_re
        l_im_o[0] = l_im

        @pl.when(i == 0)
        def _():
            gud_ref[:] = row
            gtx_ref[:] = rrow

        @pl.when(i > 0)
        def _():
            gud_ref[:] = gud_ref[:] + row
            gtx_ref[:] = gtx_ref[:] + rrow

    return kernel


def _make_passB_bwd(chunk_rots, c, fast):
    cdim = 2**c

    def kernel(tx_ref, y_re_i, y_im_i, l_re_i, l_im_i,
               y_re_o, y_im_o, l_re_o, l_im_o, gtx_ref):
        i = pl.program_id(0)
        y_re, y_im, l_re, l_im, rrow = _b_bwd_core(
            y_re_i[:], y_im_i[:], l_re_i[:], l_im_i[:], tx_ref[0],
            chunk_rots, cdim, fast)
        y_re_o[:] = y_re
        y_im_o[:] = y_im
        l_re_o[:] = l_re
        l_im_o[:] = l_im

        @pl.when(i == 0)
        def _():
            gtx_ref[:] = rrow

        @pl.when(i > 0)
        def _():
            gtx_ref[:] = gtx_ref[:] + rrow

    return kernel


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

def _row3(v):
    """[128] → [1, 1, 128] angle-row block."""
    return v.reshape(1, 1, _LANES)


def _passA_call(kernel, state, rowu, rowx, h0th3, signs3, perms, c, f,
                interp):
    cdim, fdim = 2**c, 2**f
    re, im = state
    slab = pl.BlockSpec((1, fdim, _LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    sgslab = pl.BlockSpec((1, signs3.shape[1], fdim, _LANES),
                          lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, 1, _LANES), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(cdim,),
        in_specs=[row, row, slab, sgslab, slab, slab,
                  pl.BlockSpec(perms.shape, lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(slab, slab),
        out_shape=(jax.ShapeDtypeStruct((cdim, fdim, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((cdim, fdim, _LANES), jnp.float32)),
        input_output_aliases={4: 0, 5: 1},
        interpret=interp,
        **_CK_VMEM,
    )(_row3(rowu), _row3(rowx), h0th3, signs3, re, im, perms)
    return out_re, out_im


def _passB_call(kernel, state, rowx, c, f, interp):
    cdim, fdim = 2**c, 2**f
    bf = 2 ** (_F_BITS - c) if c > 0 else fdim
    bf = min(bf, fdim)
    re, im = state
    slab = pl.BlockSpec((cdim, bf, _LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, 1, _LANES), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(fdim // bf,),
        in_specs=[row, slab, slab],
        out_specs=(slab, slab),
        out_shape=(jax.ShapeDtypeStruct((cdim, fdim, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((cdim, fdim, _LANES), jnp.float32)),
        input_output_aliases={1: 0, 2: 1},
        interpret=interp,
        **_CK_VMEM,
    )(_row3(rowx), re, im)
    return out_re, out_im


def _passA_bwd_call(kernel, yl, rowu, rowx, h0th3, signs3, perms, c, f,
                    interp):
    cdim, fdim = 2**c, 2**f
    y_re, y_im, l_re, l_im = yl
    slab = pl.BlockSpec((1, fdim, _LANES), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    sgslab = pl.BlockSpec((1, signs3.shape[1], fdim, _LANES),
                          lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, 1, _LANES), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    grow = pl.BlockSpec((1, _LANES), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    st = jax.ShapeDtypeStruct((cdim, fdim, _LANES), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(cdim,),
        in_specs=[row, row, slab, sgslab, slab, slab, slab, slab,
                  pl.BlockSpec(perms.shape, lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(slab, slab, slab, slab, grow, grow),
        out_shape=(st, st, st, st,
                   jax.ShapeDtypeStruct((1, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((1, _LANES), jnp.float32)),
        input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3},
        interpret=interp,
        **_CK_VMEM,
    )(_row3(rowu), _row3(rowx), h0th3, signs3, y_re, y_im, l_re, l_im,
      perms)
    return outs[:4], outs[4][0], outs[5][0]


def _passB_bwd_call(kernel, yl, rowx, c, f, interp):
    cdim, fdim = 2**c, 2**f
    bf = 2 ** (_F_BITS - c) if c > 0 else fdim
    bf = min(bf, fdim)
    y_re, y_im, l_re, l_im = yl
    slab = pl.BlockSpec((cdim, bf, _LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, 1, _LANES), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    grow = pl.BlockSpec((1, _LANES), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    st = jax.ShapeDtypeStruct((cdim, fdim, _LANES), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(fdim // bf,),
        in_specs=[row, slab, slab, slab, slab],
        out_specs=(slab, slab, slab, slab, grow),
        out_shape=(st, st, st, st,
                   jax.ShapeDtypeStruct((1, _LANES), jnp.float32)),
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
        interpret=interp,
        **_CK_VMEM,
    )(_row3(rowx), y_re, y_im, l_re, l_im)
    return outs[:4], outs[4][0]


# ---------------------------------------------------------------------------
# evolution driver (custom VJP)
# ---------------------------------------------------------------------------

def _setup(ud, theta_x, h0th, signs, x_qubits, n_qubits, kinds, fast):
    kinds = kinds or ("x",) * len(x_qubits)
    c, f = _plan(n_qubits)
    cdim, fdim = 2**c, 2**f
    chunk_rots, free_rots, lane_rots = _partition_rots(
        x_qubits, kinds, n_qubits, c)
    perms = _as_perms_operand(_perm_stack(lane_rots, n_qubits))
    n_steps, n_slots = ud.shape
    n_diag = n_slots - 1
    interp = jax.default_backend() == "cpu"

    # per-step angle rows, padded to 128 lanes; ud gains an h0-multiplier
    # slot (1 for the boundary half-phases, 2 for merged interior phases)
    def pad_row(v, extra=None):
        row = jnp.zeros(v.shape[:-1] + (_LANES,), jnp.float32)
        row = row.at[..., :v.shape[-1]].set(v.astype(jnp.float32))
        if extra is not None:
            row = row.at[..., v.shape[-1]].set(extra)
        return row

    ud_rows = pad_row(ud, extra=1.0)            # [T, 128], mult slot = 1
    if n_steps > 1:
        merged = pad_row(ud[:-1] + ud[1:], extra=2.0)  # [T-1, 128]
    else:
        merged = jnp.zeros((0, _LANES), jnp.float32)
    tx_rows = pad_row(theta_x)                  # [T, 128]
    zeros_row = jnp.zeros(_LANES, jnp.float32)

    h0th3 = h0th.reshape(cdim, fdim, _LANES).astype(jnp.float32)
    signs3 = jnp.moveaxis(
        signs.reshape(signs.shape[0], cdim, fdim, _LANES), 0, 1)
    return (c, f, chunk_rots, free_rots, lane_rots, perms, n_steps, n_diag,
            interp, ud_rows, merged, tx_rows, zeros_row, h0th3, signs3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def chunked_evolve(psi0: CP, ud: jnp.ndarray, theta_x: jnp.ndarray,
                   h0th: jnp.ndarray, signs: jnp.ndarray, x_qubits: tuple,
                   n_qubits: int, kinds: tuple = None,
                   fast_math: bool = False) -> CP:
    """psi(T) for 20+ qubit states, HBM-resident, two Pallas passes/step.

    psi0: CP [2^n]; ud: [n_steps, n_diag+1] scaled diag controls (slot
    k = dt/2·u_k·w_k, last = offset; see the packed kernels); theta_x:
    [n_steps, n_x]; h0th: [2^n] drift half-angles (zero cotangent); signs:
    [P, 2^n] int32 packed sign bit-planes (float0 cotangent)."""
    return _forward_ck(psi0, ud, theta_x, h0th, signs, x_qubits, n_qubits,
                       kinds, fast_math)


def _forward_ck(psi0, ud, theta_x, h0th, signs, x_qubits, n_qubits,
                kinds=None, fast_math=False):
    (c, f, chunk_rots, free_rots, lane_rots, perms, n_steps, n_diag,
     interp, ud_rows, merged, tx_rows, zeros_row, h0th3,
     signs3) = _setup(ud, theta_x, h0th, signs, x_qubits, n_qubits, kinds,
                      fast_math)
    cdim, fdim = 2**c, 2**f
    ka = _make_passA_fwd(free_rots, lane_rots, n_diag, c, f, fast_math)
    kb = _make_passB_fwd(chunk_rots, c, fast_math)
    has_b = bool(chunk_rots)

    def A(s, rowu, rowx):
        return _passA_call(ka, s, rowu, rowx, h0th3, signs3, perms, c, f,
                           interp)

    def B(s, rowx):
        if not has_b:
            return s
        return _passB_call(kb, s, rowx, c, f, interp)

    shp = (cdim, fdim, _LANES)
    s = (psi0.re.reshape(shp).astype(jnp.float32),
         psi0.im.reshape(shp).astype(jnp.float32))
    s = A(s, ud_rows[0], tx_rows[0])  # leading half-phase + rots of step 0

    def body(s, xs):
        rowm, rowx_next, rowx_cur = xs
        s = B(s, rowx_cur)            # chunk rots of step t
        s = A(s, rowm, rowx_next)     # merged phases + rots of step t+1
        return s, None

    if n_steps > 1:
        s, _ = jax.lax.scan(body, s, (merged, tx_rows[1:], tx_rows[:-1]))
    s = B(s, tx_rows[n_steps - 1])
    s = A(s, ud_rows[n_steps - 1], zeros_row)  # trailing half-phase only
    d = 2**n_qubits
    return CP(s[0].reshape(d), s[1].reshape(d))


def _fwd_ck(psi0, ud, theta_x, h0th, signs, x_qubits, n_qubits, kinds=None,
            fast_math=False):
    out = _forward_ck(psi0, ud, theta_x, h0th, signs, x_qubits, n_qubits,
                      kinds, fast_math)
    return out, (out, ud, theta_x, h0th, signs)


def _bwd_ck(x_qubits, n_qubits, kinds, fast_math, residuals, lam):
    psi_T, ud, theta_x, h0th, signs = residuals
    (c, f, chunk_rots, free_rots, lane_rots, perms, n_steps, n_diag,
     interp, ud_rows, merged, tx_rows, zeros_row, h0th3,
     signs3) = _setup(ud, theta_x, h0th, signs, x_qubits, n_qubits, kinds,
                      fast_math)
    cdim, fdim = 2**c, 2**f
    ka = _make_passA_bwd(free_rots, lane_rots, n_diag, c, f, fast_math)
    kb = _make_passB_bwd(chunk_rots, c, fast_math)
    has_b = bool(chunk_rots)

    def Ainv(yl, rowu, rowx):
        return _passA_bwd_call(ka, yl, rowu, rowx, h0th3, signs3, perms,
                               c, f, interp)

    def Binv(yl, rowx):
        if not has_b:
            return yl, jnp.zeros(_LANES, jnp.float32)
        return _passB_bwd_call(kb, yl, rowx, c, f, interp)

    shp = (cdim, fdim, _LANES)
    yl = (psi_T.re.reshape(shp).astype(jnp.float32),
          psi_T.im.reshape(shp).astype(jnp.float32),
          lam.re.reshape(shp).astype(jnp.float32),
          lam.im.reshape(shp).astype(jnp.float32))

    # reverse of: A0, [B_t, A_merge_t]_{t=0..T-2}, B_{T-1}, A_fin
    yl, g_fin, _ = Ainv(yl, ud_rows[n_steps - 1], zeros_row)
    yl, gb_last = Binv(yl, tx_rows[n_steps - 1])

    def body(yl, xs):
        rowm, rowx_next, rowx_cur = xs
        yl, gm, ga_next = Ainv(yl, rowm, rowx_next)
        yl, gb_cur = Binv(yl, rowx_cur)
        return yl, (gm, ga_next, gb_cur)

    if n_steps > 1:
        yl, (gm_rows, ga_rows, gb_rows) = jax.lax.scan(
            body, yl, (merged, tx_rows[1:], tx_rows[:-1]), reverse=True)
    else:
        gm_rows = jnp.zeros((0, _LANES), jnp.float32)
        ga_rows = jnp.zeros((0, _LANES), jnp.float32)
        gb_rows = jnp.zeros((0, _LANES), jnp.float32)
    yl, g_a0, ga0_row = Ainv(yl, ud_rows[0], tx_rows[0])

    # ud gradients: merged row s touches ud[s] and ud[s+1]
    gud = jnp.zeros((n_steps, _LANES), jnp.float32)
    if n_steps > 1:
        gud = gud.at[:-1].add(gm_rows)
        gud = gud.at[1:].add(gm_rows)
    gud = gud.at[0].add(g_a0)
    gud = gud.at[n_steps - 1].add(g_fin)

    # rotation gradients: free/lane part from the A pass that consumed
    # tx_t (A0 for t=0, A_merge_{t-1} for t>=1) + chunk part from B_t;
    # disjoint lane slots, so rows add
    gtx = jnp.concatenate([ga0_row[None], ga_rows], axis=0)
    gtx = jnp.concatenate([gb_rows, gb_last[None]], axis=0) + gtx

    d = 2**n_qubits
    return (CP(yl[2].reshape(d), yl[3].reshape(d)),
            gud[:, :ud.shape[1]].astype(ud.dtype),
            gtx[:, :theta_x.shape[1]].astype(theta_x.dtype),
            jnp.zeros_like(h0th),
            np.zeros(signs.shape, dtype=jax.dtypes.float0))


chunked_evolve.defvjp(_fwd_ck, _bwd_ck)


# ===========================================================================
# MEGA kernels: the ENTIRE chunked evolution (and its adjoint) as ONE
# pallas_call each. The per-call engine above pays a fixed per-pallas_call
# dispatch/pipeline cost for every pass — ~4*n_steps calls per gradient
# step, the dominant term at 20+ qubits once HBM traffic (~10% of peak)
# and VPU work are accounted (docs/PERFORMANCE.md roofline). Here the
# grid runs over time steps (n_steps+1), the state stays HBM-resident
# (memory_space=ANY, aliased in/out), and each grid step streams the
# state through VMEM slabs with manual make_async_copy DMA:
#
#   grid step t:  [pass B sweep: chunk rots of step t-1]   (skip at t=0)
#                 [pass A sweep: merged phases + free/lane rots of step t]
#
# with angle rows [n_steps+1, 128] streamed per grid step by BlockSpec.
# Row t of the A-pass tables carries the merged ud phases (leading half
# at t=0, trailing half at t=n_steps where the rotation row is zero —
# zero-angle rotations are exact identities). Compute is byte-identical
# to the per-call engine (same cores, same op order per element).
# ===========================================================================


def _mega_copy(src, dst, sem, k):
    cp = pltpu.make_async_copy(src, dst, sem.at[k])
    cp.start()
    return cp


def _make_mega_fwd(free_rots, lane_rots, chunk_rots, n_diag, c, f, bf,
                   fast, n_steps, batched=False):
    """``batched=True`` grids over (B, n_steps + 1): seed b is
    program_id(0), its state lives at index b of the leading axis of the
    HBM-resident planes, and its angle rows come from per-seed row blocks
    — one compiled kernel for the whole seed population (round 3 Python-
    looped per seed: a 64-seed 20q run emitted 64 mega kernels)."""
    cdim, fdim = 2**c, 2**f
    nsl = fdim // bf
    has_b = bool(chunk_rots)

    def kernel(udm_ref, txa_ref, txb_ref, h0_hbm, sg_hbm, in_re, in_im,
               perms_ref, out_re, out_im, a_re, a_im, a_h0, a_sg,
               b_re, b_im, sem):
        if batched:
            b = pl.program_id(0)
            t = pl.program_id(1)
            st_q = lambda arr, q: arr.at[b, q]                # noqa: E731
            st_f = lambda arr, o: arr.at[b, :, pl.ds(o, bf)]  # noqa: E731
            rowread = lambda ref: ref[0, 0]                   # noqa: E731
        else:
            t = pl.program_id(0)
            st_q = lambda arr, q: arr.at[q]                   # noqa: E731
            st_f = lambda arr, o: arr.at[:, pl.ds(o, bf)]     # noqa: E731
            rowread = lambda ref: ref[0]                      # noqa: E731

        if has_b:
            @pl.when(t > 0)
            def _():
                def bodyB(s, _):
                    o = s * bf
                    c1 = _mega_copy(st_f(out_re, o), b_re, sem, 0)
                    c2 = _mega_copy(st_f(out_im, o), b_im, sem, 1)
                    c1.wait()
                    c2.wait()
                    re, im = _b_fwd_core(b_re[:], b_im[:], rowread(txb_ref),
                                         chunk_rots, cdim, fast)
                    b_re[:] = re
                    b_im[:] = im
                    c3 = _mega_copy(b_re, st_f(out_re, o), sem, 0)
                    c4 = _mega_copy(b_im, st_f(out_im, o), sem, 1)
                    c3.wait()
                    c4.wait()
                    return 0

                jax.lax.fori_loop(0, nsl, bodyB, 0)

        def bodyA(q, _):
            cps = [_mega_copy(st_q(out_re, q), a_re, sem, 0),
                   _mega_copy(st_q(out_im, q), a_im, sem, 1),
                   _mega_copy(h0_hbm.at[q], a_h0, sem, 2),
                   _mega_copy(sg_hbm.at[q], a_sg, sem, 3)]
            for cp in cps:
                cp.wait()
            re, im = _a_fwd_core(a_re[:], a_im[:], rowread(udm_ref),
                                 rowread(txa_ref), a_h0[:], a_sg[:],
                                 perms_ref, free_rots, lane_rots, n_diag,
                                 c, fdim, fast)
            a_re[:] = re
            a_im[:] = im
            c5 = _mega_copy(a_re, st_q(out_re, q), sem, 0)
            c6 = _mega_copy(a_im, st_q(out_im, q), sem, 1)
            c5.wait()
            c6.wait()
            return 0

        jax.lax.fori_loop(0, cdim, bodyA, 0)

    return kernel


def _make_mega_bwd(free_rots, lane_rots, chunk_rots, n_diag, c, f, bf,
                   fast, n_steps, batched=False):
    cdim, fdim = 2**c, 2**f
    nsl = fdim // bf
    has_b = bool(chunk_rots)

    def kernel(udm_ref, txa_ref, txb_ref, h0_hbm, sg_hbm,
               yT_re, yT_im, lT_re, lT_im, perms_ref,
               y_re_o, y_im_o, l_re_o, l_im_o, gudm_ref, gtxa_ref,
               gtxb_ref, ay_re, ay_im, al_re, al_im, a_h0, a_sg,
               by_re, by_im, bl_re, bl_im, acc_ud, acc_ta, acc_tb, sem):
        if batched:
            b = pl.program_id(0)
            i = pl.program_id(1)  # processes step s = n_steps - i
            st_q = lambda arr, q: arr.at[b, q]                # noqa: E731
            st_f = lambda arr, o: arr.at[b, :, pl.ds(o, bf)]  # noqa: E731
            rowread = lambda ref: ref[0, 0]                   # noqa: E731

            def rowwrite(ref, v):
                ref[0, 0] = v
        else:
            i = pl.program_id(0)  # processes step s = n_steps - i
            st_q = lambda arr, q: arr.at[q]                   # noqa: E731
            st_f = lambda arr, o: arr.at[:, pl.ds(o, bf)]     # noqa: E731
            rowread = lambda ref: ref[0]                      # noqa: E731

            def rowwrite(ref, v):
                ref[0] = v

        acc_ud[:] = jnp.zeros((1, _LANES), jnp.float32)
        acc_ta[:] = jnp.zeros((1, _LANES), jnp.float32)
        acc_tb[:] = jnp.zeros((1, _LANES), jnp.float32)

        # ---- invert the A pass of step s (phases + free/lane rots) ----
        def bodyA(q, _):
            cps = [_mega_copy(st_q(y_re_o, q), ay_re, sem, 0),
                   _mega_copy(st_q(y_im_o, q), ay_im, sem, 1),
                   _mega_copy(st_q(l_re_o, q), al_re, sem, 2),
                   _mega_copy(st_q(l_im_o, q), al_im, sem, 3)]
            for cp in cps:
                cp.wait()
            c5 = _mega_copy(h0_hbm.at[q], a_h0, sem, 0)
            c6 = _mega_copy(sg_hbm.at[q], a_sg, sem, 1)
            c5.wait()
            c6.wait()
            y_re, y_im, l_re, l_im, row, rrow = _a_bwd_core(
                ay_re[:], ay_im[:], al_re[:], al_im[:], rowread(udm_ref),
                rowread(txa_ref), a_h0[:], a_sg[:], perms_ref, free_rots,
                lane_rots, n_diag, c, fdim, fast)
            acc_ud[:] = acc_ud[:] + row
            acc_ta[:] = acc_ta[:] + rrow
            ay_re[:] = y_re
            ay_im[:] = y_im
            al_re[:] = l_re
            al_im[:] = l_im
            cps = [_mega_copy(ay_re, st_q(y_re_o, q), sem, 0),
                   _mega_copy(ay_im, st_q(y_im_o, q), sem, 1),
                   _mega_copy(al_re, st_q(l_re_o, q), sem, 2),
                   _mega_copy(al_im, st_q(l_im_o, q), sem, 3)]
            for cp in cps:
                cp.wait()
            return 0

        jax.lax.fori_loop(0, cdim, bodyA, 0)

        # ---- invert the B pass of step s (skip at s=0, i.e. i=n_steps) --
        if has_b:
            @pl.when(i < n_steps)
            def _():
                def bodyB(s, _):
                    o = s * bf
                    cps = [_mega_copy(st_f(y_re_o, o), by_re, sem, 0),
                           _mega_copy(st_f(y_im_o, o), by_im, sem, 1),
                           _mega_copy(st_f(l_re_o, o), bl_re, sem, 2),
                           _mega_copy(st_f(l_im_o, o), bl_im, sem, 3)]
                    for cp in cps:
                        cp.wait()
                    y_re, y_im, l_re, l_im, rrow = _b_bwd_core(
                        by_re[:], by_im[:], bl_re[:], bl_im[:],
                        rowread(txb_ref), chunk_rots, cdim, fast)
                    acc_tb[:] = acc_tb[:] + rrow
                    by_re[:] = y_re
                    by_im[:] = y_im
                    bl_re[:] = l_re
                    bl_im[:] = l_im
                    cps = [_mega_copy(by_re, st_f(y_re_o, o), sem, 0),
                           _mega_copy(by_im, st_f(y_im_o, o), sem, 1),
                           _mega_copy(bl_re, st_f(l_re_o, o), sem, 2),
                           _mega_copy(bl_im, st_f(l_im_o, o), sem, 3)]
                    for cp in cps:
                        cp.wait()
                    return 0

                jax.lax.fori_loop(0, nsl, bodyB, 0)

        rowwrite(gudm_ref, acc_ud[:])
        rowwrite(gtxa_ref, acc_ta[:])
        rowwrite(gtxb_ref, acc_tb[:])

    return kernel


def _setup_mega(ud, theta_x, h0th, signs, x_qubits, n_qubits, kinds, fast):
    kinds = kinds or ("x",) * len(x_qubits)
    c, f = _plan(n_qubits)
    cdim, fdim = 2**c, 2**f
    bf = min(2 ** (_F_BITS - c) if c > 0 else fdim, fdim)
    chunk_rots, free_rots, lane_rots = _partition_rots(
        x_qubits, kinds, n_qubits, c)
    perms = _as_perms_operand(_perm_stack(lane_rots, n_qubits))
    n_steps, n_slots = ud.shape
    n_diag = n_slots - 1
    interp = jax.default_backend() == "cpu"

    def pad_row(v, extra=None):
        row = jnp.zeros(v.shape[:-1] + (_LANES,), jnp.float32)
        row = row.at[..., :v.shape[-1]].set(v.astype(jnp.float32))
        if extra is not None:
            row = row.at[..., v.shape[-1]].set(extra)
        return row

    ud_rows = pad_row(ud, extra=1.0)
    if n_steps > 1:
        merged = pad_row(ud[:-1] + ud[1:], extra=2.0)
        udm = jnp.concatenate([ud_rows[0:1], merged, ud_rows[-1:]])
    else:
        udm = jnp.concatenate([ud_rows, ud_rows])
    tx_rows = pad_row(theta_x)
    zrow = jnp.zeros((1, _LANES), jnp.float32)
    txa = jnp.concatenate([tx_rows, zrow])       # [T+1, 128]
    txb = jnp.concatenate([zrow, tx_rows])       # [T+1, 128]
    # Mosaic requires the last two block dims to divide (8, 128) or equal
    # the array dims — stream the [1, 128] rows as [T+1, 1, 128] arrays
    # with (1, 1, 128) blocks (trailing dims equal the array's).
    udm, txa, txb = udm[:, None, :], txa[:, None, :], txb[:, None, :]

    h0th3 = h0th.reshape(cdim, fdim, _LANES).astype(jnp.float32)
    signs3 = jnp.moveaxis(
        signs.reshape(signs.shape[0], cdim, fdim, _LANES), 0, 1)
    return (c, f, cdim, fdim, bf, chunk_rots, free_rots, lane_rots, perms,
            n_steps, n_diag, interp, udm, txa, txb, h0th3, signs3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def chunked_evolve_mega(psi0: CP, ud: jnp.ndarray, theta_x: jnp.ndarray,
                        h0th: jnp.ndarray, signs: jnp.ndarray,
                        x_qubits: tuple, n_qubits: int, kinds: tuple = None,
                        fast_math: bool = False) -> CP:
    """:func:`chunked_evolve` as ONE pallas_call (and one for the adjoint):
    same inputs, same math, per-pass dispatch overhead amortized away."""
    return _forward_mega(psi0, ud, theta_x, h0th, signs, x_qubits,
                         n_qubits, kinds, fast_math)


def _forward_mega(psi0, ud, theta_x, h0th, signs, x_qubits, n_qubits,
                  kinds=None, fast_math=False):
    (c, f, cdim, fdim, bf, chunk_rots, free_rots, lane_rots, perms,
     n_steps, n_diag, interp, udm, txa, txb, h0th3,
     signs3) = _setup_mega(ud, theta_x, h0th, signs, x_qubits, n_qubits,
                           kinds, fast_math)
    kernel = _make_mega_fwd(free_rots, lane_rots, chunk_rots, n_diag, c, f,
                            bf, fast_math, n_steps)
    row = pl.BlockSpec((1, 1, _LANES), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    shp = (cdim, fdim, _LANES)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(n_steps + 1,),
        in_specs=[row, row, row, anyspec, anyspec, anyspec, anyspec,
                  pl.BlockSpec(perms.shape, lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(anyspec, anyspec),
        out_shape=(jax.ShapeDtypeStruct(shp, jnp.float32),
                   jax.ShapeDtypeStruct(shp, jnp.float32)),
        input_output_aliases={5: 0, 6: 1},
        scratch_shapes=[pltpu.VMEM((fdim, _LANES), jnp.float32),
                        pltpu.VMEM((fdim, _LANES), jnp.float32),
                        pltpu.VMEM((fdim, _LANES), jnp.float32),
                        pltpu.VMEM((signs3.shape[1], fdim, _LANES),
                                   jnp.int32),
                        pltpu.VMEM((cdim, bf, _LANES), jnp.float32),
                        pltpu.VMEM((cdim, bf, _LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA((4,))],
        interpret=interp,
        **_mega_vmem(c),
    )(udm, txa, txb, h0th3, signs3,
      psi0.re.reshape(shp).astype(jnp.float32),
      psi0.im.reshape(shp).astype(jnp.float32), perms)
    d = 2**n_qubits
    return CP(out_re.reshape(d), out_im.reshape(d))


def _fwd_mega(psi0, ud, theta_x, h0th, signs, x_qubits, n_qubits,
              kinds=None, fast_math=False):
    out = _forward_mega(psi0, ud, theta_x, h0th, signs, x_qubits, n_qubits,
                        kinds, fast_math)
    return out, (out, ud, theta_x, h0th, signs)


def _bwd_mega(x_qubits, n_qubits, kinds, fast_math, residuals, lam):
    psi_T, ud, theta_x, h0th, signs = residuals
    (c, f, cdim, fdim, bf, chunk_rots, free_rots, lane_rots, perms,
     n_steps, n_diag, interp, udm, txa, txb, h0th3,
     signs3) = _setup_mega(ud, theta_x, h0th, signs, x_qubits, n_qubits,
                           kinds, fast_math)
    kernel = _make_mega_bwd(free_rots, lane_rots, chunk_rots, n_diag, c, f,
                            bf, fast_math, n_steps)
    grow = pl.BlockSpec((1, 1, _LANES), lambda i: (n_steps - i, 0, 0),
                        memory_space=pltpu.VMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    shp = (cdim, fdim, _LANES)
    st = jax.ShapeDtypeStruct(shp, jnp.float32)
    gr = jax.ShapeDtypeStruct((n_steps + 1, 1, _LANES), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(n_steps + 1,),
        # grid step i inverts step s = n_steps - i, so the angle rows are
        # streamed in REVERSE (grow), matching the gradient-row outputs.
        in_specs=[grow, grow, grow, anyspec, anyspec, anyspec, anyspec,
                  anyspec, anyspec,
                  pl.BlockSpec(perms.shape, lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(anyspec, anyspec, anyspec, anyspec, grow, grow, grow),
        out_shape=(st, st, st, st, gr, gr, gr),
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        scratch_shapes=[pltpu.VMEM((fdim, _LANES), jnp.float32),
                        pltpu.VMEM((fdim, _LANES), jnp.float32),
                        pltpu.VMEM((fdim, _LANES), jnp.float32),
                        pltpu.VMEM((fdim, _LANES), jnp.float32),
                        pltpu.VMEM((fdim, _LANES), jnp.float32),
                        pltpu.VMEM((signs3.shape[1], fdim, _LANES),
                                   jnp.int32),
                        pltpu.VMEM((cdim, bf, _LANES), jnp.float32),
                        pltpu.VMEM((cdim, bf, _LANES), jnp.float32),
                        pltpu.VMEM((cdim, bf, _LANES), jnp.float32),
                        pltpu.VMEM((cdim, bf, _LANES), jnp.float32),
                        pltpu.VMEM((1, _LANES), jnp.float32),
                        pltpu.VMEM((1, _LANES), jnp.float32),
                        pltpu.VMEM((1, _LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA((4,))],
        interpret=interp,
        **_mega_vmem(c),
    )(udm, txa, txb, h0th3, signs3,
      psi_T.re.reshape(shp).astype(jnp.float32),
      psi_T.im.reshape(shp).astype(jnp.float32),
      lam.re.reshape(shp).astype(jnp.float32),
      lam.im.reshape(shp).astype(jnp.float32), perms)
    gudm, gtxa, gtxb = outs[4][:, 0], outs[5][:, 0], outs[6][:, 0]

    # merged row t (1<=t<=n-1) touches ud[t-1] and ud[t]; row 0 / row n
    # are the boundary half-phases of ud[0] / ud[n-1]. txa row n and txb
    # row 0 are zero-angle phantom rotations — their gradients are NOT
    # parameters and are dropped.
    gud = jnp.zeros((n_steps, _LANES), jnp.float32)
    gud = gud.at[0].add(gudm[0])
    gud = gud.at[n_steps - 1].add(gudm[n_steps])
    if n_steps > 1:
        mid = gudm[1:n_steps]
        gud = gud.at[:-1].add(mid)
        gud = gud.at[1:].add(mid)
    gtx = gtxa[:n_steps] + gtxb[1:]

    d = 2**n_qubits
    return (CP(outs[2].reshape(d), outs[3].reshape(d)),
            gud[:, :ud.shape[1]].astype(ud.dtype),
            gtx[:, :theta_x.shape[1]].astype(theta_x.dtype),
            jnp.zeros_like(h0th),
            np.zeros(signs.shape, dtype=jax.dtypes.float0))


chunked_evolve_mega.defvjp(_fwd_mega, _bwd_mega)


# ===========================================================================
# Batched mega: the whole SEED POPULATION as one pallas_call — grid
# (B, n_steps + 1), seed-major so each seed's time steps stay sequential.
# Round 3 Python-looped chunked_evolve_mega per seed, compiling one mega
# kernel per seed (~1 min each at 20q); this form compiles ONCE for any B.
# Angle rows are per-seed [T+1, B, 1, 128] blocks (trailing (1, 128) =
# the array's trailing dims — the Mosaic block-divisibility rule); the
# state planes carry a leading B axis indexed by program_id(0) in the
# manual DMA.
# ===========================================================================

def _setup_mega_b(ud, theta_x, h0th, signs, x_qubits, n_qubits, kinds,
                  fast):
    """Like :func:`_setup_mega` but ud [T, B, n_slots] / theta_x
    [T, B, n_x] → per-seed row arrays [T+1, B, 1, 128]."""
    kinds = kinds or ("x",) * len(x_qubits)
    c, f = _plan(n_qubits)
    cdim, fdim = 2**c, 2**f
    bf = min(2 ** (_F_BITS - c) if c > 0 else fdim, fdim)
    chunk_rots, free_rots, lane_rots = _partition_rots(
        x_qubits, kinds, n_qubits, c)
    perms = _as_perms_operand(_perm_stack(lane_rots, n_qubits))
    n_steps, b, n_slots = ud.shape
    n_diag = n_slots - 1
    interp = jax.default_backend() == "cpu"

    def pad_row(v, extra=None):
        row = jnp.zeros(v.shape[:-1] + (_LANES,), jnp.float32)
        row = row.at[..., :v.shape[-1]].set(v.astype(jnp.float32))
        if extra is not None:
            row = row.at[..., v.shape[-1]].set(extra)
        return row

    ud_rows = pad_row(ud, extra=1.0)                    # [T, B, 128]
    if n_steps > 1:
        merged = pad_row(ud[:-1] + ud[1:], extra=2.0)
        udm = jnp.concatenate([ud_rows[0:1], merged, ud_rows[-1:]])
    else:
        udm = jnp.concatenate([ud_rows, ud_rows])
    tx_rows = pad_row(theta_x)                          # [T, B, 128]
    zrow = jnp.zeros((1, b, _LANES), jnp.float32)
    txa = jnp.concatenate([tx_rows, zrow])              # [T+1, B, 128]
    txb = jnp.concatenate([zrow, tx_rows])
    udm, txa, txb = (v[:, :, None, :] for v in (udm, txa, txb))

    h0th3 = h0th.reshape(cdim, fdim, _LANES).astype(jnp.float32)
    signs3 = jnp.moveaxis(
        signs.reshape(signs.shape[0], cdim, fdim, _LANES), 0, 1)
    return (c, f, cdim, fdim, bf, chunk_rots, free_rots, lane_rots, perms,
            n_steps, b, n_diag, interp, udm, txa, txb, h0th3, signs3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def chunked_evolve_mega_batched(psi0: CP, ud: jnp.ndarray,
                                theta_x: jnp.ndarray, h0th: jnp.ndarray,
                                signs: jnp.ndarray, x_qubits: tuple,
                                n_qubits: int, kinds: tuple = None,
                                fast_math: bool = False) -> CP:
    """Seed-batched :func:`chunked_evolve_mega`: psi0 CP [B, 2^n], ud
    [n_steps, B, n_diag+1], theta_x [n_steps, B, n_x] — per-seed pulses,
    ONE compiled kernel for the whole population."""
    return _forward_mega_b(psi0, ud, theta_x, h0th, signs, x_qubits,
                           n_qubits, kinds, fast_math)


def _forward_mega_b(psi0, ud, theta_x, h0th, signs, x_qubits, n_qubits,
                    kinds=None, fast_math=False):
    (c, f, cdim, fdim, bf, chunk_rots, free_rots, lane_rots, perms,
     n_steps, b, n_diag, interp, udm, txa, txb, h0th3,
     signs3) = _setup_mega_b(ud, theta_x, h0th, signs, x_qubits, n_qubits,
                             kinds, fast_math)
    kernel = _make_mega_fwd(free_rots, lane_rots, chunk_rots, n_diag, c, f,
                            bf, fast_math, n_steps, batched=True)
    row = pl.BlockSpec((1, 1, 1, _LANES), lambda bb, i: (i, bb, 0, 0),
                       memory_space=pltpu.VMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    shp = (b, cdim, fdim, _LANES)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(b, n_steps + 1),
        in_specs=[row, row, row, anyspec, anyspec, anyspec, anyspec,
                  pl.BlockSpec(perms.shape, lambda bb, i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(anyspec, anyspec),
        out_shape=(jax.ShapeDtypeStruct(shp, jnp.float32),
                   jax.ShapeDtypeStruct(shp, jnp.float32)),
        input_output_aliases={5: 0, 6: 1},
        scratch_shapes=[pltpu.VMEM((fdim, _LANES), jnp.float32),
                        pltpu.VMEM((fdim, _LANES), jnp.float32),
                        pltpu.VMEM((fdim, _LANES), jnp.float32),
                        pltpu.VMEM((signs3.shape[1], fdim, _LANES),
                                   jnp.int32),
                        pltpu.VMEM((cdim, bf, _LANES), jnp.float32),
                        pltpu.VMEM((cdim, bf, _LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA((4,))],
        interpret=interp,
        **_mega_vmem(c),
    )(udm, txa, txb, h0th3, signs3,
      psi0.re.reshape(shp).astype(jnp.float32),
      psi0.im.reshape(shp).astype(jnp.float32), perms)
    d = 2**n_qubits
    return CP(out_re.reshape(b, d), out_im.reshape(b, d))


def _fwd_mega_b(psi0, ud, theta_x, h0th, signs, x_qubits, n_qubits,
                kinds=None, fast_math=False):
    out = _forward_mega_b(psi0, ud, theta_x, h0th, signs, x_qubits,
                          n_qubits, kinds, fast_math)
    return out, (out, ud, theta_x, h0th, signs)


def _bwd_mega_b(x_qubits, n_qubits, kinds, fast_math, residuals, lam):
    psi_T, ud, theta_x, h0th, signs = residuals
    (c, f, cdim, fdim, bf, chunk_rots, free_rots, lane_rots, perms,
     n_steps, b, n_diag, interp, udm, txa, txb, h0th3,
     signs3) = _setup_mega_b(ud, theta_x, h0th, signs, x_qubits, n_qubits,
                             kinds, fast_math)
    kernel = _make_mega_bwd(free_rots, lane_rots, chunk_rots, n_diag, c, f,
                            bf, fast_math, n_steps, batched=True)
    grow = pl.BlockSpec((1, 1, 1, _LANES),
                        lambda bb, i: (n_steps - i, bb, 0, 0),
                        memory_space=pltpu.VMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    shp = (b, cdim, fdim, _LANES)
    st = jax.ShapeDtypeStruct(shp, jnp.float32)
    gr = jax.ShapeDtypeStruct((n_steps + 1, b, 1, _LANES), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(b, n_steps + 1),
        in_specs=[grow, grow, grow, anyspec, anyspec, anyspec, anyspec,
                  anyspec, anyspec,
                  pl.BlockSpec(perms.shape, lambda bb, i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(anyspec, anyspec, anyspec, anyspec, grow, grow, grow),
        out_shape=(st, st, st, st, gr, gr, gr),
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        scratch_shapes=[pltpu.VMEM((fdim, _LANES), jnp.float32),
                        pltpu.VMEM((fdim, _LANES), jnp.float32),
                        pltpu.VMEM((fdim, _LANES), jnp.float32),
                        pltpu.VMEM((fdim, _LANES), jnp.float32),
                        pltpu.VMEM((fdim, _LANES), jnp.float32),
                        pltpu.VMEM((signs3.shape[1], fdim, _LANES),
                                   jnp.int32),
                        pltpu.VMEM((cdim, bf, _LANES), jnp.float32),
                        pltpu.VMEM((cdim, bf, _LANES), jnp.float32),
                        pltpu.VMEM((cdim, bf, _LANES), jnp.float32),
                        pltpu.VMEM((cdim, bf, _LANES), jnp.float32),
                        pltpu.VMEM((1, _LANES), jnp.float32),
                        pltpu.VMEM((1, _LANES), jnp.float32),
                        pltpu.VMEM((1, _LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA((4,))],
        interpret=interp,
        **_mega_vmem(c),
    )(udm, txa, txb, h0th3, signs3,
      psi_T.re.reshape(shp).astype(jnp.float32),
      psi_T.im.reshape(shp).astype(jnp.float32),
      lam.re.reshape(shp).astype(jnp.float32),
      lam.im.reshape(shp).astype(jnp.float32), perms)
    gudm = outs[4][:, :, 0]   # [T+1, B, 128]
    gtxa = outs[5][:, :, 0]
    gtxb = outs[6][:, :, 0]

    gud = jnp.zeros((n_steps, gudm.shape[1], _LANES), jnp.float32)
    gud = gud.at[0].add(gudm[0])
    gud = gud.at[n_steps - 1].add(gudm[n_steps])
    if n_steps > 1:
        mid = gudm[1:n_steps]
        gud = gud.at[:-1].add(mid)
        gud = gud.at[1:].add(mid)
    gtx = gtxa[:n_steps] + gtxb[1:]

    d = 2**n_qubits
    bsz = gudm.shape[1]
    return (CP(outs[2].reshape(bsz, d), outs[3].reshape(bsz, d)),
            gud[:, :, :ud.shape[2]].astype(ud.dtype),
            gtx[:, :, :theta_x.shape[2]].astype(theta_x.dtype),
            jnp.zeros_like(h0th),
            np.zeros(signs.shape, dtype=jax.dtypes.float0))


chunked_evolve_mega_batched.defvjp(_fwd_mega_b, _bwd_mega_b)
