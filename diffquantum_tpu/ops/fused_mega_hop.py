"""Hop-capable mega chunked evolution: molecule drive sets at 19-24 qubits.

The plain chunked engine (:mod:`.fused_chunked`) regroups rotations into a
free/lane pass (A) and a chunk-bit pass (B) and relies on every A op
commuting with every B op (distinct qubits) — exact for QAOA-style drive
sets, impossible once hop (XX+YY) pairs chain qubits across the partition
(a connected drive set on >17 qubits cannot fit either pass's block).

This engine drops the commutation requirement with a palindromic pass
schedule (Strang-within-Strang). Per time step, with P the diagonal
phases, A the pass-A rotations and B the pass-B rotations:

    S(dt) = P(dt/2) · A(½, fwd order) · B_pal · A(½, reversed) · P(dt/2)

— a symmetric composition of exact factors, hence O(dt^3) local error
regardless of which ops commute (tests/test_strang_order.py pins the
order). ``B_pal`` is the B ops at half angle forward then reversed (one
full-angle sweep when they pairwise commute). Across steps the trailing
A(½, reversed) of step t, the merged phases, and the leading A(½) of step
t+1 fuse into ONE pass-A sweep, so the steady state still costs exactly
one A pass + one B pass per step — the same pass count as the plain
engine; the rotation work doubles, which is what the 17-qubit streamed
kernels already pay for shared-qubit (palindromic) molecule sets.

**Visibility layout.** Pass A slabs [1, F, 128] see the free + lane bits;
pass B blocks [C, bf, 128] see the chunk bits, the LOW log2(bf) free bits,
and the lanes. An op is routed to a pass whose block contains all its
bits; a hop between a chunk bit and a HIGH free bit fits neither. A static
qubit→position relabeling (:func:`plan_chunked_hop_layout`) places the
chunk set's hop-neighbors into the low free positions, so every hop of a
bounded-degree drive graph (chains, ladders — the molecule sets) is
visible to one pass; the wrapper bit-transposes the state / sign planes
in and out (XLA transposes outside the kernel, autodiff-transparent).

The reference accepts any Hermitian control list at any size it can
dense-exponentiate (`/root/reference/sim_plain.py:272-274`, walled at
~12-13 qubits); this engine carries its hop/molecule drive sets to the
24-qubit single-chip frontier.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cpx import CP
from .fused_chunked import (_flip2, _mega_copy, _mega_vmem, _plan,
                            _theta_row)
from .fused_product import (_multi_dot, _pdot, _xor_perm_matrix,
                            _xor_signed_matrix)

_LANES = 128
_LANE_QUBITS = 7


# ---------------------------------------------------------------------------
# layout planning: qubit -> position relabeling + op -> pass assignment
# ---------------------------------------------------------------------------

def plan_chunked_hop_layout(entries, kinds, n_qubits):
    """Choose a qubit→position permutation for the hop mega engine.

    Positions: [0, c) chunk, [c, c+f) free, [c+f, n) lanes; pass B sees
    chunk + positions >= 2c (low free) + lanes, pass A sees positions
    >= c. The chunk set is chosen greedily (first c qubits by label —
    optimal for chain/near-neighbor hop graphs) and its hop-neighbors are
    kept OUT of the c high-free positions [c, 2c). Returns ``perm`` with
    ``perm[p] = original qubit at position p`` (identity-free layouts
    return the identity tuple), or None when no feasible layout exists
    (e.g. a hop graph so dense the chunk boundary cannot be cleared)."""
    try:
        c, f = _plan(n_qubits)
    except ValueError:
        return None
    if c == 0:
        return tuple(range(n_qubits))
    adj = {q: set() for q in range(n_qubits)}
    for ent, kd in zip(entries, kinds):
        if kd == "hop":
            i, j = ent
            adj[i].add(j)
            adj[j].add(i)
    for chunk in (tuple(range(c)), tuple(range(n_qubits - c, n_qubits))):
        nbrs = set()
        for q in chunk:
            nbrs |= adj[q]
        nbrs -= set(chunk)
        rest = [q for q in range(n_qubits) if q not in chunk]
        hf = [q for q in rest if q not in nbrs][:c]
        if len(hf) < c:
            continue
        others = [q for q in rest if q not in hf]
        return tuple(list(chunk) + hf + others)
    return None


def _assign_passes(entries_pos, kinds, c, n_qubits):
    """Split ops (position space) into (a_ops, b_ops) index lists. Pass A
    holds every op whose positions are all >= c; the rest must fit pass B
    (no position in the high-free band [c, 2c))."""
    a_idx, b_idx = [], []
    for j, (ent, kd) in enumerate(zip(entries_pos, kinds)):
        ps = ent if isinstance(ent, tuple) else (ent,)
        if all(p >= c for p in ps):
            a_idx.append(j)
        elif all(p < c or p >= 2 * c for p in ps):
            b_idx.append(j)
        else:
            raise ValueError(
                f"op {j} spans the chunk / high-free boundary "
                f"(positions {ps}) — plan_chunked_hop_layout should have "
                "prevented this")
    return a_idx, b_idx


def _plan_hop_ops(entries_pos, kinds, n_qubits, c, f):
    """Kernel op plans. Returns (a_ops, b_ops, perms):

    - a_ops entries ``(j, kind, fbits, perm_idx, mask_spec)`` on slabs
      [F, 128]: fbits = F-axis bits to flip (from MSB), perm_idx into the
      stacked lane matrices, mask_spec (hop) = ((axis, shift), (axis,
      shift)) with axis 0 = F rows, axis 1 = lanes;
    - b_ops entries ``(j, kind, cbits, fbits_local, perm_idx, mask_spec)``
      on blocks [C, bf, 128]: axes 0 = chunk, 1 = low-free, 2 = lanes.
    """
    a_idx, b_idx = _assign_passes(entries_pos, kinds, c, n_qubits)
    lane0 = c + f
    mats = []

    def lane_perm(ps, kind):
        mask = 0
        for p in ps:
            if p >= lane0:
                mask |= 1 << (n_qubits - 1 - p)
        if not mask:
            return None
        mats.append(_xor_signed_matrix(mask) if kind == "y"
                    else _xor_perm_matrix(mask))
        return len(mats) - 1

    a_ops = []
    for j in a_idx:
        ent, kd = entries_pos[j], kinds[j]
        ps = ent if isinstance(ent, tuple) else (ent,)
        fbits = tuple(p - c for p in ps if p < lane0)
        perm_idx = lane_perm(ps, kd)
        mask_spec = None
        if kd == "hop":
            mask_spec = tuple(
                (0, f - 1 - (p - c)) if p < lane0
                else (1, n_qubits - 1 - p) for p in ps)
        a_ops.append((j, kd, fbits, perm_idx, mask_spec))

    b_ops = []
    for j in b_idx:
        ent, kd = entries_pos[j], kinds[j]
        ps = ent if isinstance(ent, tuple) else (ent,)
        cbits = tuple(p for p in ps if p < c)
        fbl = tuple(p - 2 * c for p in ps if c <= p < lane0)
        perm_idx = lane_perm(ps, kd)
        mask_spec = None
        if kd == "hop":
            def spec_b(p):
                if p < c:
                    return (0, c - 1 - p)
                if p < lane0:
                    return (1, f - 1 - (p - c))
                return (2, n_qubits - 1 - p)
            mask_spec = tuple(spec_b(p) for p in ps)
        b_ops.append((j, kd, cbits, fbl, perm_idx, mask_spec))

    perms = np.stack(mats).astype(np.float32) if mats else \
        np.zeros((1, _LANES, _LANES), np.float32)
    # B ops pairwise disjoint => they commute => one full-angle sweep
    used = [p for j in b_idx
            for p in (entries_pos[j] if isinstance(entries_pos[j], tuple)
                      else (entries_pos[j],))]
    b_commute = len(set(used)) == len(used)
    return a_ops, b_ops, perms, b_commute


# ---------------------------------------------------------------------------
# in-kernel generator / rotation helpers
# ---------------------------------------------------------------------------

def _flip_mid(x, hi, sign=False):
    """Pair-swap a middle-axis bit of [C, M, L] (``hi`` blocks above it)."""
    c0, m, l = x.shape
    lo = m // (hi * 2)
    y = x.reshape(c0, hi, 2, lo, l)
    top = -y[:, :, 1:2] if sign else y[:, :, 1:2]
    y = jnp.concatenate([top, y[:, :, 0:1]], axis=2)
    return y.reshape(c0, m, l)


def _b_dot(x, p, fast):
    c0, m, _ = x.shape
    return _pdot(x.reshape(c0 * m, _LANES), p, fast).reshape(x.shape)


def _hop_mask_nd(shape, mask_spec):
    bits = []
    for axis, shift in mask_spec:
        ids = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
        bits.append(jnp.bitwise_and(
            jax.lax.shift_right_logical(ids, np.int32(shift)), np.int32(1)))
    return jnp.bitwise_xor(bits[0], bits[1]).astype(jnp.float32)


def _g_multi_a(op, perms_ref, fdim, fast):
    (_, kind, fbits, perm_idx, _) = op
    sign = kind == "y"

    def g(vs):
        for b in fbits:
            vs = [_flip2(v, 2**b, fdim, (_LANES,), sign=sign) for v in vs]
        if perm_idx is not None:
            vs = _multi_dot(perms_ref[perm_idx], _pdot, fast)(vs)
        return vs

    return g


def _g_multi_b(op, perms_ref, cdim, fast):
    (_, kind, cbits, fbl, perm_idx, _) = op
    sign = kind == "y"

    def g(vs):
        tail = vs[0].shape[1:]
        for b in cbits:
            vs = [_flip2(v, 2**b, cdim, tail, sign=sign) for v in vs]
        for b in fbl:
            vs = [_flip_mid(v, 2**b, sign=sign) for v in vs]
        if perm_idx is not None:
            vs = _multi_dot(perms_ref[perm_idx], _b_dot, fast)(vs)
        return vs

    return g


def _rot_apply(kind, th, g_multi, m, re, im):
    """Forward rotation (same math as the fused_product kernels)."""
    cth, sth = jnp.cos(th), jnp.sin(th)
    if kind == "x":
        g_im, g_re = g_multi([im, re])
        return cth * re + sth * g_im, cth * im - sth * g_re
    if kind == "y":
        g_re, g_im = g_multi([re, im])
        return cth * re + sth * g_re, cth * im + sth * g_im
    ct = 1.0 + m * (cth - 1.0)
    g_im, g_re = g_multi([im, re])
    return ct * re + sth * (m * g_im), ct * im - sth * (m * g_re)


def _rot_undo(kind, thx, g_multi, m, y_re, y_im, l_re, l_im):
    """Invert one rotation, evolve the cotangent, return the scalar angle
    gradient integrand (G(x) derived from G(y) — 4 generator applications,
    see fused_product's backward kernels)."""
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
    elif kind == "y":
        ky_re, ky_im, kl_re, kl_im = g_multi([y_re, y_im, l_re, l_im])
        x_re = cx * y_re - sx * ky_re
        x_im = cx * y_im - sx * ky_im
        gx_re = cx * ky_re + sx * y_re
        gx_im = cx * ky_im + sx * y_im
        contrib = (l_re * (-sx * x_re + cx * gx_re)
                   + l_im * (-sx * x_im + cx * gx_im))
        nl_re = cx * l_re - sx * kl_re
        nl_im = cx * l_im - sx * kl_im
    else:  # hop
        ct = 1.0 + m * (cx - 1.0)
        ty_re, ty_im, tl_im, tl_re = g_multi([y_re, y_im, l_im, l_re])
        gy_re = m * ty_re
        gy_im = m * ty_im
        x_re = ct * y_re - sx * gy_im
        x_im = ct * y_im + sx * gy_re
        gx_re = cx * gy_re - sx * (m * y_im)
        gx_im = cx * gy_im + sx * (m * y_re)
        contrib = (l_re * (-sx * (m * x_re) + cx * gx_im)
                   + l_im * (-sx * (m * x_im) - cx * gx_re))
        nl_re = ct * l_re - sx * (m * tl_im)
        nl_im = ct * l_im + sx * (m * tl_re)
    return x_re, x_im, nl_re, nl_im, contrib


# ---------------------------------------------------------------------------
# pass cores
# ---------------------------------------------------------------------------

def _a_hop_fwd(re, im, udm_row, txp_row, txc_row, h0_blk, sg_blk,
               perms_ref, a_ops, n_diag, fdim, fast):
    """Merged pass-A sweep: previous step's reversed half-rotations, the
    merged diagonal phase, the current step's forward half-rotations.
    Angle rows already carry the half angles."""
    def sweep(row, ops):
        nonlocal re, im
        for op in ops:
            m = _hop_mask_nd((fdim, _LANES), op[4]) if op[1] == "hop" \
                else None
            re, im = _rot_apply(op[1], row[0, op[0]],
                                _g_multi_a(op, perms_ref, fdim, fast),
                                m, re, im)

    sweep(txp_row, list(reversed(a_ops)))
    th = _theta_row(udm_row, h0_blk, sg_blk, n_diag)
    cph, sph = jnp.cos(th), jnp.sin(th)
    re, im = cph * re + sph * im, cph * im - sph * re
    sweep(txc_row, a_ops)
    return re, im


def _b_hop_fwd(re, im, txb_row, b_ops, perms_ref, cdim, b_commute, fast):
    """Pass-B sweep: half-angle forward + half-angle reversed (palindromic),
    or one full-angle sweep when the ops pairwise commute. The row carries
    the per-application angle either way."""
    def one(op):
        nonlocal re, im
        m = _hop_mask_nd(re.shape, op[5]) if op[1] == "hop" else None
        re, im = _rot_apply(op[1], txb_row[0, op[0]],
                            _g_multi_b(op, perms_ref, cdim, fast),
                            m, re, im)

    for op in b_ops:
        one(op)
    if not b_commute:
        for op in reversed(b_ops):
            one(op)
    return re, im


def _a_hop_bwd(y_re, y_im, l_re, l_im, udm_row, txp_row, txc_row, h0_blk,
               sg_blk, perms_ref, a_ops, n_diag, fdim, fast):
    """Invert one pass-A sweep; returns (y, l planes, gud_row, gtxc_row,
    gtxp_row) with gradients reduced to per-slot scalars."""
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    def unsweep(row, ops, grow):
        nonlocal y_re, y_im, l_re, l_im
        for op in ops:
            m = _hop_mask_nd((fdim, _LANES), op[4]) if op[1] == "hop" \
                else None
            y_re, y_im, l_re, l_im, contrib = _rot_undo(
                op[1], row[0, op[0]],
                _g_multi_a(op, perms_ref, fdim, fast), m,
                y_re, y_im, l_re, l_im)
            grow = grow + jnp.where(lane_ids == op[0], jnp.sum(contrib),
                                    0.0)
        return grow

    gtxc = unsweep(txc_row, list(reversed(a_ops)),
                   jnp.zeros((1, _LANES), jnp.float32))

    # undo the merged phase; diag gradients to per-term scalars
    from .fused_product import _PLANE_BITS
    th = _theta_row(udm_row, h0_blk, sg_blk, n_diag)
    cph, sph = jnp.cos(th), jnp.sin(th)
    gth = l_re * y_im - l_im * y_re
    s0 = jnp.sum(gth)
    gud = jnp.zeros((1, _LANES), jnp.float32)
    for k in range(n_diag):
        bit = jnp.bitwise_and(
            jax.lax.shift_right_logical(sg_blk[k // _PLANE_BITS],
                                        np.int32(k % _PLANE_BITS)),
            np.int32(1)).astype(jnp.float32)
        gud = jnp.where(lane_ids == k, s0 - 2.0 * jnp.sum(gth * bit), gud)
    gud = jnp.where(lane_ids == n_diag, s0, gud)
    ny_re = cph * y_re - sph * y_im
    ny_im = sph * y_re + cph * y_im
    nl_re = cph * l_re - sph * l_im
    nl_im = sph * l_re + cph * l_im
    y_re, y_im, l_re, l_im = ny_re, ny_im, nl_re, nl_im

    gtxp = unsweep(txp_row, a_ops, jnp.zeros((1, _LANES), jnp.float32))
    return y_re, y_im, l_re, l_im, gud, gtxc, gtxp


def _b_hop_bwd(y_re, y_im, l_re, l_im, txb_row, b_ops, perms_ref, cdim,
               b_commute, fast):
    """Invert one pass-B sweep; returns (planes..., gtxb_row) with the two
    palindromic applications' gradients accumulated into one row."""
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    grow = jnp.zeros((1, _LANES), jnp.float32)

    def unsweep(ops):
        nonlocal y_re, y_im, l_re, l_im, grow
        for op in ops:
            m = _hop_mask_nd(y_re.shape, op[5]) if op[1] == "hop" else None
            y_re, y_im, l_re, l_im, contrib = _rot_undo(
                op[1], txb_row[0, op[0]],
                _g_multi_b(op, perms_ref, cdim, fast), m,
                y_re, y_im, l_re, l_im)
            grow = grow + jnp.where(lane_ids == op[0], jnp.sum(contrib),
                                    0.0)

    if not b_commute:
        unsweep(b_ops)          # undo the reversed half-sweep
    unsweep(list(reversed(b_ops)))  # undo the forward sweep
    return y_re, y_im, l_re, l_im, grow


# ---------------------------------------------------------------------------
# mega kernels (one pallas_call per direction, manual DMA)
# ---------------------------------------------------------------------------

def _make_mega_hop_fwd(a_ops, b_ops, n_diag, c, f, bf, fast, n_steps,
                       b_commute):
    cdim, fdim = 2**c, 2**f
    nsl = fdim // bf
    has_b = bool(b_ops)

    def kernel(udm_ref, txp_ref, txc_ref, txb_ref, h0_hbm, sg_hbm,
               in_re, in_im, perms_ref, out_re, out_im, a_re, a_im,
               a_h0, a_sg, b_re, b_im, sem):
        t = pl.program_id(0)

        if has_b:
            @pl.when(t > 0)
            def _():
                def bodyB(s, _):
                    o = s * bf
                    c1 = _mega_copy(out_re.at[:, pl.ds(o, bf)], b_re, sem, 0)
                    c2 = _mega_copy(out_im.at[:, pl.ds(o, bf)], b_im, sem, 1)
                    c1.wait()
                    c2.wait()
                    re, im = _b_hop_fwd(b_re[:], b_im[:], txb_ref[0],
                                        b_ops, perms_ref, cdim, b_commute,
                                        fast)
                    b_re[:] = re
                    b_im[:] = im
                    c3 = _mega_copy(b_re, out_re.at[:, pl.ds(o, bf)], sem, 0)
                    c4 = _mega_copy(b_im, out_im.at[:, pl.ds(o, bf)], sem, 1)
                    c3.wait()
                    c4.wait()
                    return 0

                jax.lax.fori_loop(0, nsl, bodyB, 0)

        def bodyA(q, _):
            cps = [_mega_copy(out_re.at[q], a_re, sem, 0),
                   _mega_copy(out_im.at[q], a_im, sem, 1),
                   _mega_copy(h0_hbm.at[q], a_h0, sem, 2),
                   _mega_copy(sg_hbm.at[q], a_sg, sem, 3)]
            for cp in cps:
                cp.wait()
            re, im = _a_hop_fwd(a_re[:], a_im[:], udm_ref[0], txp_ref[0],
                                txc_ref[0], a_h0[:], a_sg[:], perms_ref,
                                a_ops, n_diag, fdim, fast)
            a_re[:] = re
            a_im[:] = im
            c5 = _mega_copy(a_re, out_re.at[q], sem, 0)
            c6 = _mega_copy(a_im, out_im.at[q], sem, 1)
            c5.wait()
            c6.wait()
            return 0

        jax.lax.fori_loop(0, cdim, bodyA, 0)

    return kernel


def _make_mega_hop_bwd(a_ops, b_ops, n_diag, c, f, bf, fast, n_steps,
                       b_commute):
    cdim, fdim = 2**c, 2**f
    nsl = fdim // bf
    has_b = bool(b_ops)

    def kernel(udm_ref, txp_ref, txc_ref, txb_ref, h0_hbm, sg_hbm,
               yT_re, yT_im, lT_re, lT_im, perms_ref,
               y_re_o, y_im_o, l_re_o, l_im_o, gudm_ref, gtxc_ref,
               gtxp_ref, gtxb_ref, ay_re, ay_im, al_re, al_im, a_h0,
               a_sg, by_re, by_im, bl_re, bl_im, acc_ud, acc_tc, acc_tp,
               acc_tb, sem):
        i = pl.program_id(0)  # inverts pass A of step s = n_steps - i,
                              # then pass B of step s - 1

        acc_ud[:] = jnp.zeros((1, _LANES), jnp.float32)
        acc_tc[:] = jnp.zeros((1, _LANES), jnp.float32)
        acc_tp[:] = jnp.zeros((1, _LANES), jnp.float32)
        acc_tb[:] = jnp.zeros((1, _LANES), jnp.float32)

        def bodyA(q, _):
            cps = [_mega_copy(y_re_o.at[q], ay_re, sem, 0),
                   _mega_copy(y_im_o.at[q], ay_im, sem, 1),
                   _mega_copy(l_re_o.at[q], al_re, sem, 2),
                   _mega_copy(l_im_o.at[q], al_im, sem, 3)]
            for cp in cps:
                cp.wait()
            c5 = _mega_copy(h0_hbm.at[q], a_h0, sem, 0)
            c6 = _mega_copy(sg_hbm.at[q], a_sg, sem, 1)
            c5.wait()
            c6.wait()
            (y_re, y_im, l_re, l_im, gud, gtxc, gtxp) = _a_hop_bwd(
                ay_re[:], ay_im[:], al_re[:], al_im[:], udm_ref[0],
                txp_ref[0], txc_ref[0], a_h0[:], a_sg[:], perms_ref,
                a_ops, n_diag, fdim, fast)
            acc_ud[:] = acc_ud[:] + gud
            acc_tc[:] = acc_tc[:] + gtxc
            acc_tp[:] = acc_tp[:] + gtxp
            ay_re[:] = y_re
            ay_im[:] = y_im
            al_re[:] = l_re
            al_im[:] = l_im
            cps = [_mega_copy(ay_re, y_re_o.at[q], sem, 0),
                   _mega_copy(ay_im, y_im_o.at[q], sem, 1),
                   _mega_copy(al_re, l_re_o.at[q], sem, 2),
                   _mega_copy(al_im, l_im_o.at[q], sem, 3)]
            for cp in cps:
                cp.wait()
            return 0

        jax.lax.fori_loop(0, cdim, bodyA, 0)

        if has_b:
            @pl.when(i < n_steps)
            def _():
                def bodyB(s, _):
                    o = s * bf
                    cps = [_mega_copy(y_re_o.at[:, pl.ds(o, bf)], by_re,
                                      sem, 0),
                           _mega_copy(y_im_o.at[:, pl.ds(o, bf)], by_im,
                                      sem, 1),
                           _mega_copy(l_re_o.at[:, pl.ds(o, bf)], bl_re,
                                      sem, 2),
                           _mega_copy(l_im_o.at[:, pl.ds(o, bf)], bl_im,
                                      sem, 3)]
                    for cp in cps:
                        cp.wait()
                    y_re, y_im, l_re, l_im, grow = _b_hop_bwd(
                        by_re[:], by_im[:], bl_re[:], bl_im[:],
                        txb_ref[0], b_ops, perms_ref, cdim, b_commute,
                        fast)
                    acc_tb[:] = acc_tb[:] + grow
                    by_re[:] = y_re
                    by_im[:] = y_im
                    bl_re[:] = l_re
                    bl_im[:] = l_im
                    cps = [_mega_copy(by_re, y_re_o.at[:, pl.ds(o, bf)],
                                      sem, 0),
                           _mega_copy(by_im, y_im_o.at[:, pl.ds(o, bf)],
                                      sem, 1),
                           _mega_copy(bl_re, l_re_o.at[:, pl.ds(o, bf)],
                                      sem, 2),
                           _mega_copy(bl_im, l_im_o.at[:, pl.ds(o, bf)],
                                      sem, 3)]
                    for cp in cps:
                        cp.wait()
                    return 0

                jax.lax.fori_loop(0, nsl, bodyB, 0)

        gudm_ref[0] = acc_ud[:]
        gtxc_ref[0] = acc_tc[:]
        gtxp_ref[0] = acc_tp[:]
        gtxb_ref[0] = acc_tb[:]

    return kernel


# ---------------------------------------------------------------------------
# driver (custom VJP)
# ---------------------------------------------------------------------------

def _pad_row(v, width=_LANES, extra=None):
    row = jnp.zeros(v.shape[:-1] + (width,), jnp.float32)
    row = row.at[..., :v.shape[-1]].set(v.astype(jnp.float32))
    if extra is not None:
        row = row.at[..., v.shape[-1]].set(extra)
    return row


def _setup_hop(ud, theta_x, h0th, signs, x_entries, n_qubits, kinds, fast):
    kinds = kinds or ("x",) * len(x_entries)
    c, f = _plan(n_qubits)
    cdim, fdim = 2**c, 2**f
    bf = min(2 ** (f - c) if c > 0 else fdim, fdim)
    a_ops, b_ops, perms, b_commute = _plan_hop_ops(
        tuple(x_entries), tuple(kinds), n_qubits, c, f)
    perms = jnp.asarray(perms)
    n_steps, n_slots = ud.shape
    n_diag = n_slots - 1
    interp = jax.default_backend() == "cpu"

    ud_rows = _pad_row(ud, extra=1.0)
    if n_steps > 1:
        merged = _pad_row(ud[:-1] + ud[1:], extra=2.0)
        udm = jnp.concatenate([ud_rows[0:1], merged, ud_rows[-1:]])
    else:
        udm = jnp.concatenate([ud_rows, ud_rows])
    # pass-A rows always carry HALF angles (each op applies twice across
    # adjacent passes); pass-B rows carry half angles only when the B ops
    # need the internal palindrome
    txh = _pad_row(0.5 * theta_x)
    txbh = _pad_row((0.5 if not b_commute else 1.0) * theta_x)
    zrow = jnp.zeros((1, _LANES), jnp.float32)
    txp = jnp.concatenate([zrow, txh])[:, None, :]    # [T+1, 1, 128]
    txc = jnp.concatenate([txh, zrow])[:, None, :]
    txb = jnp.concatenate([zrow, txbh])[:, None, :]
    udm = udm[:, None, :]

    h0th3 = h0th.reshape(cdim, fdim, _LANES).astype(jnp.float32)
    signs3 = jnp.moveaxis(
        signs.reshape(signs.shape[0], cdim, fdim, _LANES), 0, 1)
    return (c, f, cdim, fdim, bf, a_ops, b_ops, b_commute, perms, n_steps,
            n_diag, interp, udm, txp, txc, txb, h0th3, signs3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def chunked_evolve_mega_hop(psi0: CP, ud: jnp.ndarray, theta_x: jnp.ndarray,
                            h0th: jnp.ndarray, signs: jnp.ndarray,
                            x_entries: tuple, n_qubits: int,
                            kinds: tuple = None,
                            fast_math: bool = False) -> CP:
    """Hop-capable mega chunked evolution (palindromic pass schedule).

    Inputs mirror :func:`.fused_chunked.chunked_evolve_mega`; ``x_entries``
    holds ints (1q) or (i, j) position pairs (hops) in the ALREADY
    RELABELED position space (see :func:`plan_chunked_hop_layout` — the
    wrapper in dynamics/product.py permutes the state / sign planes)."""
    return _forward_hop(psi0, ud, theta_x, h0th, signs, x_entries,
                        n_qubits, kinds, fast_math)


def _forward_hop(psi0, ud, theta_x, h0th, signs, x_entries, n_qubits,
                 kinds=None, fast_math=False):
    (c, f, cdim, fdim, bf, a_ops, b_ops, b_commute, perms, n_steps, n_diag,
     interp, udm, txp, txc, txb, h0th3, signs3) = _setup_hop(
        ud, theta_x, h0th, signs, x_entries, n_qubits, kinds, fast_math)
    kernel = _make_mega_hop_fwd(a_ops, b_ops, n_diag, c, f, bf, fast_math,
                                n_steps, b_commute)
    row = pl.BlockSpec((1, 1, _LANES), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    shp = (cdim, fdim, _LANES)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(n_steps + 1,),
        in_specs=[row, row, row, row, anyspec, anyspec, anyspec, anyspec,
                  pl.BlockSpec(perms.shape, lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(anyspec, anyspec),
        out_shape=(jax.ShapeDtypeStruct(shp, jnp.float32),
                   jax.ShapeDtypeStruct(shp, jnp.float32)),
        input_output_aliases={6: 0, 7: 1},
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
    )(udm, txp, txc, txb, h0th3, signs3,
      psi0.re.reshape(shp).astype(jnp.float32),
      psi0.im.reshape(shp).astype(jnp.float32), perms)
    d = 2**n_qubits
    return CP(out_re.reshape(d), out_im.reshape(d))


def _fwd_hop(psi0, ud, theta_x, h0th, signs, x_entries, n_qubits,
             kinds=None, fast_math=False):
    out = _forward_hop(psi0, ud, theta_x, h0th, signs, x_entries, n_qubits,
                       kinds, fast_math)
    return out, (out, ud, theta_x, h0th, signs)


def _bwd_hop(x_entries, n_qubits, kinds, fast_math, residuals, lam):
    psi_T, ud, theta_x, h0th, signs = residuals
    (c, f, cdim, fdim, bf, a_ops, b_ops, b_commute, perms, n_steps, n_diag,
     interp, udm, txp, txc, txb, h0th3, signs3) = _setup_hop(
        ud, theta_x, h0th, signs, x_entries, n_qubits, kinds, fast_math)
    kernel = _make_mega_hop_bwd(a_ops, b_ops, n_diag, c, f, bf, fast_math,
                                n_steps, b_commute)
    grow = pl.BlockSpec((1, 1, _LANES), lambda i: (n_steps - i, 0, 0),
                        memory_space=pltpu.VMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    shp = (cdim, fdim, _LANES)
    st = jax.ShapeDtypeStruct(shp, jnp.float32)
    gr = jax.ShapeDtypeStruct((n_steps + 1, 1, _LANES), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(n_steps + 1,),
        in_specs=[grow, grow, grow, grow, anyspec, anyspec, anyspec,
                  anyspec, anyspec, anyspec,
                  pl.BlockSpec(perms.shape, lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(anyspec, anyspec, anyspec, anyspec, grow, grow, grow,
                   grow),
        out_shape=(st, st, st, st, gr, gr, gr, gr),
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
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
                        pltpu.VMEM((1, _LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA((4,))],
        interpret=interp,
        **_mega_vmem(c),
    )(udm, txp, txc, txb, h0th3, signs3,
      psi_T.re.reshape(shp).astype(jnp.float32),
      psi_T.im.reshape(shp).astype(jnp.float32),
      lam.re.reshape(shp).astype(jnp.float32),
      lam.im.reshape(shp).astype(jnp.float32), perms)
    gudm = outs[4][:, 0]
    gtxc = outs[5][:, 0]
    gtxp = outs[6][:, 0]
    gtxb = outs[7][:, 0]

    # merged phase rows: row t (1<=t<=T-1) touches ud[t-1] and ud[t]
    gud = jnp.zeros((n_steps, _LANES), jnp.float32)
    gud = gud.at[0].add(gudm[0])
    gud = gud.at[n_steps - 1].add(gudm[n_steps])
    if n_steps > 1:
        mid = gudm[1:n_steps]
        gud = gud.at[:-1].add(mid)
        gud = gud.at[1:].add(mid)

    # rotation rows carry HALVED angles: theta/2 applied as txc at grid t
    # and txp at grid t+1 (chain factor 0.5 each); pass-B rows likewise
    # when palindromic
    gtx = 0.5 * (gtxc[:n_steps] + gtxp[1:])
    gtx = gtx + (0.5 if not b_commute else 1.0) * gtxb[1:]

    d = 2**n_qubits
    return (CP(outs[2].reshape(d), outs[3].reshape(d)),
            gud[:, :ud.shape[1]].astype(ud.dtype),
            gtx[:, :theta_x.shape[1]].astype(theta_x.dtype),
            jnp.zeros_like(h0th),
            np.zeros(signs.shape, dtype=jax.dtypes.float0))


chunked_evolve_mega_hop.defvjp(_fwd_hop, _bwd_hop)


def permute_amplitude_bits(x: jnp.ndarray, perm) -> jnp.ndarray:
    """Relabel the qubits of the LAST axis (length 2^n): output position p
    carries input qubit ``perm[p]`` — a (2,)*n transpose, fused by XLA and
    transparent to autodiff. Identity permutations return x unchanged."""
    n = len(perm)
    if tuple(perm) == tuple(range(n)):
        return x
    lead = x.shape[:-1]
    k = len(lead)
    y = x.reshape(lead + (2,) * n)
    y = jnp.transpose(y, tuple(range(k)) + tuple(k + p for p in perm))
    return y.reshape(lead + (2**n,))


def invert_perm(perm):
    inv = [0] * len(perm)
    for p, q in enumerate(perm):
        inv[q] = p
    return tuple(inv)
