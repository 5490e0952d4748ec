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


def _make_forward_kernel(n_steps, row_rots, lane_rots, n_row_bits,
                         fast=False):
    def kernel(th_ref, tx_ref, pin_re, pin_im, perms_ref, out_re, out_im,
               s_re, s_im):
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

        def rot(j, kind, g_of):
            th = tx_ref[0, 0, j]
            c, s = jnp.cos(th), jnp.sin(th)
            if kind == "x":
                # y = c x - i s Gx (G real symmetric): planes cross
                re = c * s_re[:] + s * g_of(s_im[:])
                im = c * s_im[:] - s * g_of(s_re[:])
            else:
                # Y: exp(-i th Y) = c I + s K (K real): planes independent
                re = c * s_re[:] + s * g_of(s_re[:])
                im = c * s_im[:] + s * g_of(s_im[:])
            s_re[:] = re
            s_im[:] = im

        phase()
        for (j, q, kind) in row_rots:
            flip = _flip_row if kind == "x" else _sflip_row
            rot(j, kind, lambda v, q=q, f=flip: f(v, q, n_row_bits))
        for li, (j, q, kind) in enumerate(lane_rots):
            p = perms_ref[li]
            rot(j, kind, lambda v, p=p: _pdot(v, p, fast))
        phase()

        @pl.when(i == n_steps - 1)
        def _():
            out_re[:] = s_re[:]
            out_im[:] = s_im[:]

    return kernel


def _make_backward_kernel(n_steps, row_rots, lane_rots, n_row_bits,
                          fast=False):
    """Reversed-step adjoint: reconstructs the state by inverting each
    unitary op; accumulates dL/dtheta_half (streamed per step) and
    dL/dtheta_x (streamed per step, padded to 128 lanes)."""

    def kernel(th_ref, tx_ref, pT_re, pT_im, lamT_re, lamT_im, perms_ref,
               gth_ref, gtx_ref, gp0_re, gp0_im, y_re, y_im, l_re, l_im):
        i = pl.program_id(0)  # i-th reversed step

        @pl.when(i == 0)
        def _():
            y_re[:] = pT_re[:]
            y_im[:] = pT_im[:]
            l_re[:] = lamT_re[:]
            l_im[:] = lamT_im[:]

        th = th_ref[0]
        c, s = jnp.cos(th), jnp.sin(th)
        gth = jnp.zeros_like(th)
        g_rot = {}  # j -> scalar dL/dtheta_x[j], written once at the end

        # --- undo trailing phase: grad uses OUTPUT y and output-side lam --
        gth += l_re[:] * y_im[:] - l_im[:] * y_re[:]
        # x = e^{+i th} y ; lam_x = e^{+i th} lam_y
        re = c * y_re[:] - s * y_im[:]
        im = s * y_re[:] + c * y_im[:]
        y_re[:] = re
        y_im[:] = im
        re = c * l_re[:] - s * l_im[:]
        im = s * l_re[:] + c * l_im[:]
        l_re[:] = re
        l_im[:] = im

        # --- undo rotations in reverse order ------------------------------
        def undo_rot(j, kind, g_of):
            thx = tx_ref[0, 0, j]
            cx, sx = jnp.cos(thx), jnp.sin(thx)
            if kind == "x":
                # reconstruct x = c y + i s G y; lam_x = c lam + i s G lam;
                # dL/dth = sum lam . (-s x - i c Gx)
                gy_re = g_of(y_re[:])
                gy_im = g_of(y_im[:])
                x_re = cx * y_re[:] - sx * gy_im
                x_im = cx * y_im[:] + sx * gy_re
                gx_re = g_of(x_re)
                gx_im = g_of(x_im)
                g_rot[j] = jnp.sum(l_re[:] * (-sx * x_re + cx * gx_im)
                                   + l_im[:] * (-sx * x_im - cx * gx_re))
                gl_re = g_of(l_re[:])
                gl_im = g_of(l_im[:])
                nl_re = cx * l_re[:] - sx * gl_im
                nl_im = cx * l_im[:] + sx * gl_re
            else:
                # Y: M = c I + s K orthogonal (K^T = -K) → inverse =
                # transpose = c I - s K, same map for x and lam;
                # dy/dth = -s x + c K x (per plane)
                x_re = cx * y_re[:] - sx * g_of(y_re[:])
                x_im = cx * y_im[:] - sx * g_of(y_im[:])
                gx_re = g_of(x_re)
                gx_im = g_of(x_im)
                g_rot[j] = jnp.sum(l_re[:] * (-sx * x_re + cx * gx_re)
                                   + l_im[:] * (-sx * x_im + cx * gx_im))
                nl_re = cx * l_re[:] - sx * g_of(l_re[:])
                nl_im = cx * l_im[:] - sx * g_of(l_im[:])
            y_re[:] = x_re
            y_im[:] = x_im
            l_re[:] = nl_re
            l_im[:] = nl_im

        for li in range(len(lane_rots) - 1, -1, -1):
            j, q, kind = lane_rots[li]
            p = perms_ref[li]
            undo_rot(j, kind, lambda v, p=p: _pdot(v, p, fast))
        for (j, q, kind) in reversed(row_rots):
            flip = _flip_row if kind == "x" else _sflip_row
            undo_rot(j, kind, lambda v, q=q, f=flip: f(v, q, n_row_bits))

        # --- undo leading phase -------------------------------------------
        gth += l_re[:] * y_im[:] - l_im[:] * y_re[:]
        re = c * y_re[:] - s * y_im[:]
        im = s * y_re[:] + c * y_im[:]
        y_re[:] = re
        y_im[:] = im
        re = c * l_re[:] - s * l_im[:]
        im = s * l_re[:] + c * l_im[:]
        l_re[:] = re
        l_im[:] = im

        gth_ref[0] = gth
        # assemble the per-step rotation-gradient row (one VMEM write)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        row = jnp.zeros((1, _LANES), jnp.float32)
        for j, g in g_rot.items():
            row = jnp.where(lane_ids == j, g, row)
        gtx_ref[0] = row

        @pl.when(i == n_steps - 1)
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
    row_rots, lane_rots = _split_qubits(x_qubits, kinds, n_qubits)
    perms = _perm_stack(lane_rots, n_qubits)

    kernel = _make_forward_kernel(n_steps, row_rots, lane_rots, n_row_bits,
                                  fast_math)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(n_steps,),
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
    )(theta_half.reshape(n_steps, r, _LANES).astype(jnp.float32),
      _pad_tx(theta_x),
      psi0.re.reshape(r, _LANES).astype(jnp.float32),
      psi0.im.reshape(r, _LANES).astype(jnp.float32),
      jnp.asarray(perms))
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
    row_rots, lane_rots = _split_qubits(x_qubits, kinds, n_qubits)
    perms = _perm_stack(lane_rots, n_qubits)

    kernel = _make_backward_kernel(n_steps, row_rots, lane_rots, n_row_bits,
                                   fast_math)
    rev = lambda i: (n_steps - 1 - i, 0, 0)  # noqa: E731
    gth, gtx, gp_re, gp_im = pl.pallas_call(
        kernel,
        grid=(n_steps,),
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
            jax.ShapeDtypeStruct((n_steps, r, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, 1, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((r, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((r, _LANES), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((r, _LANES), jnp.float32),
                        pltpu.VMEM((r, _LANES), jnp.float32),
                        pltpu.VMEM((r, _LANES), jnp.float32),
                        pltpu.VMEM((r, _LANES), jnp.float32)],
        interpret=(jax.default_backend() == "cpu"),
    )(theta_half.reshape(n_steps, r, _LANES).astype(jnp.float32),
      _pad_tx(theta_x),
      psi_T.re.reshape(r, _LANES).astype(jnp.float32),
      psi_T.im.reshape(r, _LANES).astype(jnp.float32),
      lam.re.reshape(r, _LANES).astype(jnp.float32),
      lam.im.reshape(r, _LANES).astype(jnp.float32),
      jnp.asarray(perms))
    return (CP(gp_re.reshape(d), gp_im.reshape(d)),
            gth.reshape(n_steps, d).astype(theta_half.dtype),
            gtx[:, 0, :theta_x.shape[1]].astype(theta_x.dtype))


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


def _make_forward_kernel_b(n_steps, row_rots, lane_rots, fast=False):
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

        def rot(j, kind, g_of):
            th = tx_ref[0, j]  # [B, 1, 128] (angle replicated along lanes)
            c, s = jnp.cos(th), jnp.sin(th)
            if kind == "x":
                re = c * s_re[:] + s * g_of(s_im[:])
                im = c * s_im[:] - s * g_of(s_re[:])
            else:  # Y: c I + s K, planes independent
                re = c * s_re[:] + s * g_of(s_re[:])
                im = c * s_im[:] + s * g_of(s_im[:])
            s_re[:] = re
            s_im[:] = im

        phase()
        for (j, q, kind) in row_rots:
            flip = _bflip_row if kind == "x" else _bsflip_row
            rot(j, kind, lambda v, q=q, f=flip: f(v, q))
        for li, (j, q, kind) in enumerate(lane_rots):
            p = perms_ref[li]
            rot(j, kind, lambda v, p=p: _blane_dot(v, p, fast))
        phase()

        @pl.when(i == n_steps - 1)
        def _():
            out_re[:] = s_re[:]
            out_im[:] = s_im[:]

    return kernel


def _make_backward_kernel_b(n_steps, row_rots, lane_rots, fast=False):
    def kernel(th_ref, tx_ref, pT_re, pT_im, lamT_re, lamT_im, perms_ref,
               gth_ref, gtx_ref, gp0_re, gp0_im, y_re, y_im, l_re, l_im):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            y_re[:] = pT_re[:]
            y_im[:] = pT_im[:]
            l_re[:] = lamT_re[:]
            l_im[:] = lamT_im[:]

        th = th_ref[0]
        c, s = jnp.cos(th), jnp.sin(th)
        g_rot = {}

        def undo_phase(gth):
            gth = gth + (l_re[:] * y_im[:] - l_im[:] * y_re[:])
            re = c * y_re[:] - s * y_im[:]
            im = s * y_re[:] + c * y_im[:]
            y_re[:] = re
            y_im[:] = im
            re = c * l_re[:] - s * l_im[:]
            im = s * l_re[:] + c * l_im[:]
            l_re[:] = re
            l_im[:] = im
            return gth

        gth = undo_phase(jnp.zeros_like(th))

        def undo_rot(j, kind, g_of):
            thx = tx_ref[0, j]  # [B, 1, 128]
            cx, sx = jnp.cos(thx), jnp.sin(thx)
            if kind == "x":
                gy_re = g_of(y_re[:])
                gy_im = g_of(y_im[:])
                x_re = cx * y_re[:] - sx * gy_im
                x_im = cx * y_im[:] + sx * gy_re
                gx_re = g_of(x_re)
                gx_im = g_of(x_im)
                contrib = (l_re[:] * (-sx * x_re + cx * gx_im)
                           + l_im[:] * (-sx * x_im - cx * gx_re))
                nl_re = cx * l_re[:] - sx * g_of(l_im[:])
                nl_im = cx * l_im[:] + sx * g_of(l_re[:])
            else:  # Y: inverse = transpose = c I - s K (same for x and lam)
                x_re = cx * y_re[:] - sx * g_of(y_re[:])
                x_im = cx * y_im[:] - sx * g_of(y_im[:])
                gx_re = g_of(x_re)
                gx_im = g_of(x_im)
                contrib = (l_re[:] * (-sx * x_re + cx * gx_re)
                           + l_im[:] * (-sx * x_im + cx * gx_im))
                nl_re = cx * l_re[:] - sx * g_of(l_re[:])
                nl_im = cx * l_im[:] - sx * g_of(l_im[:])
            # rank-2 all the way (Mosaic dislikes rank-1 intermediates)
            g_rot[j] = jnp.sum(jnp.sum(contrib, axis=2), axis=1,
                               keepdims=True)  # [B, 1]
            y_re[:] = x_re
            y_im[:] = x_im
            l_re[:] = nl_re
            l_im[:] = nl_im

        for li in range(len(lane_rots) - 1, -1, -1):
            j, q, kind = lane_rots[li]
            p = perms_ref[li]
            undo_rot(j, kind, lambda v, p=p: _blane_dot(v, p, fast))
        for (j, q, kind) in reversed(row_rots):
            flip = _bflip_row if kind == "x" else _bsflip_row
            undo_rot(j, kind, lambda v, q=q, f=flip: f(v, q))

        gth = undo_phase(gth)
        gth_ref[0] = gth

        b = gth.shape[0]
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (b, _LANES), 1)
        row = jnp.zeros((b, _LANES), jnp.float32)
        for j, g in g_rot.items():
            row = jnp.where(lane_ids == j, g, row)  # g [B,1] broadcasts
        gtx_ref[0] = row

        @pl.when(i == n_steps - 1)
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
    row_rots, lane_rots = _split_qubits(x_qubits, kinds, n_qubits)
    perms = _perm_stack(lane_rots, n_qubits)
    return n_steps, b, d, r, row_rots, lane_rots, perms


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
    n_steps, b, d, r, row_rots, lane_rots, perms = _common_b(
        theta_half, x_qubits, kinds, n_qubits)
    kernel = _make_forward_kernel_b(n_steps, row_rots, lane_rots, fast_math)
    n_x = max(theta_x.shape[2], 1)
    state_spec = pl.BlockSpec((b, r, _LANES), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(n_steps,),
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
    )(theta_half.reshape(n_steps, b, r, _LANES).astype(jnp.float32),
      _pad_tx_b(theta_x),
      psi0.re.reshape(b, r, _LANES).astype(jnp.float32),
      psi0.im.reshape(b, r, _LANES).astype(jnp.float32),
      jnp.asarray(perms))
    return CP(out_re.reshape(b, d), out_im.reshape(b, d))


def _fwd_b(psi0, theta_half, theta_x, x_qubits, n_qubits, kinds=None,
           fast_math=False):
    out = _forward_b(psi0, theta_half, theta_x, x_qubits, n_qubits, kinds,
                     fast_math)
    return out, (out, theta_half, theta_x)


def _bwd_b(x_qubits, n_qubits, kinds, fast_math, residuals, lam):
    psi_T, theta_half, theta_x = residuals
    n_steps, b, d, r, row_rots, lane_rots, perms = _common_b(
        theta_half, x_qubits, kinds, n_qubits)
    kernel = _make_backward_kernel_b(n_steps, row_rots, lane_rots, fast_math)
    n_x = max(theta_x.shape[2], 1)
    rev4 = lambda i: (n_steps - 1 - i, 0, 0, 0)  # noqa: E731
    rev3 = lambda i: (n_steps - 1 - i, 0, 0)  # noqa: E731
    rev5 = lambda i: (n_steps - 1 - i, 0, 0, 0, 0)  # noqa: E731
    state_spec = pl.BlockSpec((b, r, _LANES), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    gth, gtx, gp_re, gp_im = pl.pallas_call(
        kernel,
        grid=(n_steps,),
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
            jax.ShapeDtypeStruct((n_steps, b, r, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, b, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, r, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, r, _LANES), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((b, r, _LANES), jnp.float32),
                        pltpu.VMEM((b, r, _LANES), jnp.float32),
                        pltpu.VMEM((b, r, _LANES), jnp.float32),
                        pltpu.VMEM((b, r, _LANES), jnp.float32)],
        interpret=(jax.default_backend() == "cpu"),
    )(theta_half.reshape(n_steps, b, r, _LANES).astype(jnp.float32),
      _pad_tx_b(theta_x),
      psi_T.re.reshape(b, r, _LANES).astype(jnp.float32),
      psi_T.im.reshape(b, r, _LANES).astype(jnp.float32),
      lam.re.reshape(b, r, _LANES).astype(jnp.float32),
      lam.im.reshape(b, r, _LANES).astype(jnp.float32),
      jnp.asarray(perms))
    return (CP(gp_re.reshape(b, d), gp_im.reshape(b, d)),
            gth.reshape(n_steps, b, d).astype(theta_half.dtype),
            gtx[:, :, :theta_x.shape[2]].astype(theta_x.dtype))


fused_product_evolve_batched.defvjp(_fwd_b, _bwd_b)


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
