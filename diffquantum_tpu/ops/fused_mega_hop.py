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
one A pass + one B pass per step.

**Table-driven sweeps (round 4).** The first cut of this engine unrolled
every rotation op into the kernel body (~2x(n_1q + n_hop) static op
applications per pass). Mosaic compile cost explodes with unrolled op
count: the 19q molecule forward took 291 s to compile and the backward
got the remote compile helper OOM-killed — compile time, not runtime, is
the binding constraint on this toolchain (docs/PERFORMANCE.md). The
sweeps are now a ``lax.fori_loop`` over an OP TABLE: one compiled
rotation body, ops as runtime data. Uniformity comes from three tricks:

- every op's amplitude motion = XOR bit-flips on the block axes (runtime
  masks, applied as per-bit static flips behind scalar selects) composed
  with one lane matmul against a stacked XOR-permutation operand
  (runtime index, identity at slot 0);
- X, Y and hop share the X-form rotation ``ct·v + sin θ·(m ⊙ G v)`` with
  ``ct = 1 + m(cos θ - 1)``: 1q ops take m ≡ 1 and hops take the
  per-element parity mask built from two runtime bit positions;
- Y is the X-form conjugated by S = diag(1, i) per qubit
  (Y = S X S†), applied as two cheap per-element twists — so the signed
  permutation disappears from the op vocabulary.

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
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cpx import CP
from .fused_chunked import _mega_copy, _plan
from .fused_product import _PLANE_BITS, _pdot

_LANES = 128
_LANE_QUBITS = 7
_VMEM_MIB_HOP = int(os.environ.get("DQ_VMEM_MIB_HOP", "48"))

# op-table column layout ([K, 128] int32, one row per op)
_C_SLOT = 0    # angle column in the [1, 128] angle rows
_C_M0 = 1      # XOR flip mask, block axis 0 (chunk) — LSB bit convention
_C_M1 = 2      # XOR flip mask, block axis 1 (free / low-free)
_C_LMASK = 3   # lane XOR mask (perm matrix built in-kernel from iotas)
_C_TW0, _C_TW1, _C_TW2 = 4, 5, 6   # Y-twist bit shift per axis (31 = off)
_C_ISHOP = 7   # 1 => per-element hop mask applies (else m ≡ 1)
_C_HA0, _C_HA1, _C_HA2 = 8, 9, 10   # hop bit 1: shift per axis (31 = off)
_C_HB0, _C_HB1, _C_HB2 = 11, 12, 13  # hop bit 2
_INACTIVE = 31  # >> 31 of any block-axis index yields 0


# ---------------------------------------------------------------------------
# layout planning: qubit -> position relabeling + op -> pass assignment
# ---------------------------------------------------------------------------

def plan_chunked_hop_layout(entries, kinds, n_qubits):
    """Choose a qubit→position permutation for the hop mega engine.

    Positions: [0, c) chunk, [c, c+f) free, [c+f, n) lanes; pass B sees
    chunk + positions >= 2c (low free) + lanes, pass A sees positions
    >= c. Candidate chunk sets, tried in order: the first / last c
    qubits by label (optimal for chain/near-neighbor hop graphs), then
    BFS-connected c-blocks grown from each of the lowest-degree vertices
    (connected blocks have the smallest hop boundary, so they clear the
    high-free band for graphs whose labels don't follow the geometry —
    ADVICE r4). The chunk's hop-neighbors are kept OUT of the c
    high-free positions [c, 2c). Returns ``perm`` with ``perm[p] =
    original qubit at position p`` (identity-free layouts return the
    identity tuple), or None (with a warning — the caller falls back to
    the ~14-30x slower XLA product engine) when no candidate clears the
    boundary (a hop graph denser than the free band can absorb)."""
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

    def bfs_block(start):
        seen, order = {start}, [start]
        qi = 0
        while len(order) < c:
            if qi < len(order):
                frontier = sorted(adj[order[qi]] - seen)
                qi += 1
            else:  # disconnected — pull in the next unvisited label
                frontier = [q for q in range(n_qubits) if q not in seen][:1]
            for q in frontier:
                if len(order) >= c:
                    break
                seen.add(q)
                order.append(q)
        return tuple(sorted(order))

    by_degree = sorted(range(n_qubits), key=lambda q: (len(adj[q]), q))
    candidates = [tuple(range(c)), tuple(range(n_qubits - c, n_qubits))]
    candidates += [bfs_block(s) for s in by_degree[:4]]
    tried = set()
    for chunk in candidates:
        if chunk in tried:
            continue
        tried.add(chunk)
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
    import warnings
    warnings.warn(
        f"no feasible chunk layout for this {n_qubits}-qubit hop graph "
        f"({sum(len(v) for v in adj.values()) // 2} hop edges): the "
        "evolution falls back to the XLA product engine (roughly "
        "14-30x slower at mega sizes — docs/PERFORMANCE.md)",
        stacklevel=2)
    return None


def _assign_passes(entries_pos, kinds, c, n_qubits):
    """Split ops (position space) into (a_idx, b_idx) index lists. Pass A
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


def _op_tables(entries_pos, kinds, n_qubits, c, f):
    """Build the pass-A/pass-B op tables ([Kpad, 128] int32 rows, see the
    _C_* column map) plus the deduped lane-permutation mask list and the
    B-commutation flag. Bit conventions (LSB index bits of each block
    axis): position p < c → axis 0 bit c-1-p; c <= p < c+f → axis 1 bit
    f-1-(p-c) (pass B sees only the low log2(bf) of these — guaranteed by
    :func:`_assign_passes`); lane position → axis 2 bit n-1-p."""
    a_idx, b_idx = _assign_passes(entries_pos, kinds, c, n_qubits)
    lane0 = c + f

    def bit_axes(p):
        if p < c:
            return 0, c - 1 - p
        if p < lane0:
            return 1, f - 1 - (p - c)
        return 2, n_qubits - 1 - p

    def build(idx_list):
        rows = []
        for j in idx_list:
            ent, kd = entries_pos[j], kinds[j]
            ps = ent if isinstance(ent, tuple) else (ent,)
            r = np.zeros(_LANES, np.int32)
            r[_C_SLOT] = j
            for col in (_C_TW0, _C_TW1, _C_TW2, _C_HA0, _C_HA1, _C_HA2,
                        _C_HB0, _C_HB1, _C_HB2):
                r[col] = _INACTIVE
            lmask = 0
            for p in ps:
                ax, sh = bit_axes(p)
                if ax == 0:
                    r[_C_M0] |= 1 << sh
                elif ax == 1:
                    r[_C_M1] |= 1 << sh
                else:
                    lmask |= 1 << sh
            r[_C_LMASK] = lmask
            if kd == "y":
                ax, sh = bit_axes(ps[0])
                r[(_C_TW0, _C_TW1, _C_TW2)[ax]] = sh
            elif kd == "hop":
                r[_C_ISHOP] = 1
                for cols, p in (((_C_HA0, _C_HA1, _C_HA2), ps[0]),
                                ((_C_HB0, _C_HB1, _C_HB2), ps[1])):
                    ax, sh = bit_axes(p)
                    r[cols[ax]] = sh
            rows.append(r)
        k = len(rows)
        kpad = max(8, -(-k // 8) * 8)
        tbl = np.zeros((kpad, _LANES), np.int32)
        if rows:
            tbl[:k] = np.stack(rows)
        return tbl, k

    tbl_a, ka = build(a_idx)
    tbl_b, kb = build(b_idx)
    used = [p for j in b_idx
            for p in (entries_pos[j] if isinstance(entries_pos[j], tuple)
                      else (entries_pos[j],))]
    b_commute = len(set(used)) == len(used)
    return tbl_a, ka, tbl_b, kb, b_commute


def _lane_perm(lmask):
    """[128, 128] f32 XOR-permutation matrix from a RUNTIME lane mask,
    built from two iotas (Mosaic has no dynamic_slice lowering, so a
    stacked-matrices operand cannot be indexed by a traced op field —
    and this is cheaper anyway: three vector ops, no operand)."""
    lr = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
    lc = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
    return jnp.where(jnp.equal(jnp.bitwise_xor(lr, lmask), lc),
                     1.0, 0.0).astype(jnp.float32)


def _hop_vmem() -> dict:
    """compiler_params for the HOP mega kernels: the table-driven sweeps
    keep several [F, 128] temporaries plus the packed matmul operand live
    per loop iteration; grant the 48 MiB hardware-safe cap (the plain
    mega kernels' 16 MiB default OOMed at 19q, chip-measured round 4).
    DQ_VMEM_MIB_HOP overrides for experiments — read ONCE at import
    (module constant): the value bakes into compiled programs, so set it
    before the first import (ADVICE r4)."""
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_MIB_HOP * 2**20)}


# ---------------------------------------------------------------------------
# in-kernel table machinery
# ---------------------------------------------------------------------------

def _flip3(v, axis, j):
    """Static pair-swap of LSB index bit ``j`` on axis 0 or 1 of a
    [D0, D1, L] value (same reshape+concat trick as fused_chunked._flip2,
    never touching the lane axis)."""
    d0, d1, l = v.shape
    if axis == 0:
        hi = d0 >> (j + 1)
        y = v.reshape(hi, 2, d0 // (2 * hi), d1, l)
        y = jnp.concatenate([y[:, 1:2], y[:, 0:1]], axis=1)
        return y.reshape(d0, d1, l)
    hi = d1 >> (j + 1)
    y = v.reshape(d0, hi, 2, d1 // (2 * hi), l)
    y = jnp.concatenate([y[:, :, 1:2], y[:, :, 0:1]], axis=2)
    return y.reshape(d0, d1, l)


def _flip_mask(v, m0, m1, nb0, nb1):
    """XOR-flip by RUNTIME masks on axes 0/1: per-bit static flips behind
    scalar selects (compiled once — the op loop's uniformity hinges on
    this)."""
    for j in range(nb0):
        f = _flip3(v, 0, j)
        bit = jnp.bitwise_and(
            jax.lax.shift_right_logical(m0, np.int32(j)), np.int32(1))
        v = jnp.where(bit == 1, f, v)
    for j in range(nb1):
        f = _flip3(v, 1, j)
        bit = jnp.bitwise_and(
            jax.lax.shift_right_logical(m1, np.int32(j)), np.int32(1))
        v = jnp.where(bit == 1, f, v)
    return v


def _motion(vs, m0, m1, pm, nb0, nb1, fast):
    """Uniform generator motion: axis flips then ONE packed lane matmul
    over all planes (identity matrix at perm slot 0 keeps the code path
    single — the MXU-invocation packing of fused_product._multi_dot)."""
    vs = [_flip_mask(v, m0, m1, nb0, nb1) for v in vs]
    d0, d1, l = vs[0].shape
    rr = d0 * d1
    out = _pdot(jnp.concatenate([v.reshape(rr, l) for v in vs], axis=0),
                pm, fast)
    return [jax.lax.slice_in_dim(out, i * rr, (i + 1) * rr, axis=0)
            .reshape(d0, d1, l) for i in range(len(vs))]


def _tw_in(re, im, b):
    """S† per-element twist (z → -i z where b == 1): Y = S X S†."""
    return jnp.where(b == 1, im, re), jnp.where(b == 1, -re, im)


def _tw_out(re, im, b):
    """S per-element twist (z → i z where b == 1)."""
    return jnp.where(b == 1, -im, re), jnp.where(b == 1, re, im)


def _bit_nd(i0, i1, i2, s0, s1, s2):
    """Per-element bit ((I0>>s0) ^ (I1>>s1) ^ (I2>>s2)) & 1 with runtime
    shifts; shift 31 parks an axis (block indices < 2^31)."""
    v = jnp.bitwise_xor(
        jnp.bitwise_xor(jax.lax.shift_right_logical(i0, s0),
                        jax.lax.shift_right_logical(i1, s1)),
        jax.lax.shift_right_logical(i2, s2))
    return jnp.bitwise_and(v, 1)


def _iotas3(shape):
    return tuple(jax.lax.broadcasted_iota(jnp.int32, shape, a)
                 for a in range(3))


def _ext_row(tbl, i0t, kk):
    """[1, 128] int32 row kk of the table value (masked-sum extraction —
    avoids dynamic sublane slicing and its alignment rules)."""
    return jnp.sum(jnp.where(i0t == kk, tbl, 0), axis=0, keepdims=True)


def _ext_i(row, i1t, col):
    # x64 mode (CPU tests) promotes int sums to int64; the shift/compare
    # consumers need int32
    return jnp.sum(jnp.where(i1t == col, row, 0)).astype(jnp.int32)


def _ext_f(row, i1t, col):
    return jnp.sum(jnp.where(i1t == col, row, 0.0))


def _op_fields(tbl, i0t, i1r, kk):
    """i1r must be a [1, 128] lane iota (matching the extracted row's
    shape — a table-shaped iota would broadcast the row K times)."""
    row = _ext_row(tbl, i0t, kk)
    g = lambda c: _ext_i(row, i1r, c)  # noqa: E731
    return (g(_C_SLOT), g(_C_M0), g(_C_M1), g(_C_LMASK),
            (g(_C_TW0), g(_C_TW1), g(_C_TW2)), g(_C_ISHOP),
            (g(_C_HA0), g(_C_HA1), g(_C_HA2)),
            (g(_C_HB0), g(_C_HB1), g(_C_HB2)))


def _hop_m(i0, i1, i2, ha, hb, ishop):
    """Per-element hop mask (parity of the two hop bits) or the constant
    1 for single-qubit ops — the X-form rotation's m."""
    bit = jnp.bitwise_xor(_bit_nd(i0, i1, i2, *ha),
                          _bit_nd(i0, i1, i2, *hb)).astype(jnp.float32)
    return jnp.where(ishop == 1, bit, jnp.ones_like(bit))


def _sweep_fwd(re, im, tbl, arow, k_ops, nb0, nb1, fast, reverse):
    """Forward table sweep over ``k_ops`` ops (3-D [D0, D1, L] planes).
    ``arow`` is the [1, 128] angle row (already half-angled by the
    driver); ``reverse`` iterates the table backwards (the palindromic
    sweeps)."""
    shape = re.shape
    i0, i1, i2 = _iotas3(shape)
    i0t = jax.lax.broadcasted_iota(jnp.int32, tbl.shape, 0)
    i1r = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    ia = jax.lax.broadcasted_iota(jnp.int32, arow.shape, 1)

    def body(k, carry):
        re, im = carry
        kk = (k_ops - 1 - k) if reverse else k
        slot, m0, m1, lmask, tw, ishop, ha, hb = _op_fields(
            tbl, i0t, i1r, kk)
        th = _ext_f(arow, ia, slot)
        pm = _lane_perm(lmask)
        twb = _bit_nd(i0, i1, i2, *tw)
        m = _hop_m(i0, i1, i2, ha, hb, ishop)
        re, im = _tw_in(re, im, twb)
        cth, sth = jnp.cos(th), jnp.sin(th)
        gim, gre = _motion([im, re], m0, m1, pm, nb0, nb1, fast)
        ct = 1.0 + m * (cth - 1.0)
        re, im = (ct * re + sth * (m * gim), ct * im - sth * (m * gre))
        return _tw_out(re, im, twb)

    return jax.lax.fori_loop(0, k_ops, body, (re, im))


def _sweep_bwd(y_re, y_im, l_re, l_im, grow, tbl, arow, k_ops,
               nb0, nb1, fast, reverse):
    """Inverse table sweep: reconstructs the pre-sweep state, evolves the
    cotangent, accumulates per-slot angle gradients into ``grow``
    ([1, 128]). ``reverse`` is the PROCESSING order (undoing a forward-
    order sweep processes ops reversed, and vice versa)."""
    shape = y_re.shape
    i0, i1, i2 = _iotas3(shape)
    i0t = jax.lax.broadcasted_iota(jnp.int32, tbl.shape, 0)
    i1r = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    ia = jax.lax.broadcasted_iota(jnp.int32, arow.shape, 1)


    def body(k, carry):
        y_re, y_im, l_re, l_im, grow = carry
        kk = (k_ops - 1 - k) if reverse else k
        slot, m0, m1, lmask, tw, ishop, ha, hb = _op_fields(
            tbl, i0t, i1r, kk)
        thx = _ext_f(arow, ia, slot)
        pm = _lane_perm(lmask)
        twb = _bit_nd(i0, i1, i2, *tw)
        m = _hop_m(i0, i1, i2, ha, hb, ishop)
        y_re, y_im = _tw_in(y_re, y_im, twb)
        l_re, l_im = _tw_in(l_re, l_im, twb)
        cx, sx = jnp.cos(thx), jnp.sin(thx)
        ty_re, ty_im, tl_im, tl_re = _motion(
            [y_re, y_im, l_im, l_re], m0, m1, pm, nb0, nb1, fast)
        ct = 1.0 + m * (cx - 1.0)
        gy_re, gy_im = m * ty_re, m * ty_im
        x_re = ct * y_re - sx * gy_im
        x_im = ct * y_im + sx * gy_re
        gx_re = cx * gy_re - sx * (m * y_im)
        gx_im = cx * gy_im + sx * (m * y_re)
        contrib = (l_re * (-sx * (m * x_re) + cx * gx_im)
                   + l_im * (-sx * (m * x_im) - cx * gx_re))
        nl_re = ct * l_re - sx * (m * tl_im)
        nl_im = ct * l_im + sx * (m * tl_re)
        x_re, x_im = _tw_out(x_re, x_im, twb)
        nl_re, nl_im = _tw_out(nl_re, nl_im, twb)
        grow = grow + jnp.where(i1r == slot, jnp.sum(contrib), 0.0)
        return x_re, x_im, nl_re, nl_im, grow

    return jax.lax.fori_loop(0, k_ops, body,
                             (y_re, y_im, l_re, l_im, grow))


def _sel_plane(signs_blk, pidx):
    """signs_blk[pidx] with a traced plane index (P <= 4 static chain)."""
    plane = signs_blk[0]
    for p in range(1, signs_blk.shape[0]):
        plane = jnp.where(pidx == p, signs_blk[p], plane)
    return plane


def _theta_loop(ud_row, h0_blk, signs_blk, n_diag):
    """Per-slab diagonal phase from a [1, 128] angle row (layout
    [a_0..a_{n_diag-1}, offset, h0_mult]) — fori_loop over terms instead
    of fused_chunked._theta_row's static unroll (n_diag reaches 120)."""
    ia = jax.lax.broadcasted_iota(jnp.int32, ud_row.shape, 1)
    ext = lambda c: _ext_f(ud_row, ia, c)  # noqa: E731
    th0 = ext(n_diag + 1) * h0_blk + ext(n_diag)
    if not n_diag:
        return th0

    def body(k, th):
        a = ext(k)
        plane = _sel_plane(signs_blk, k // _PLANE_BITS)
        bit = jnp.bitwise_and(
            jax.lax.shift_right_logical(plane, jnp.mod(k, _PLANE_BITS).astype(jnp.int32)),
            1).astype(jnp.float32)
        return th + a - (2.0 * a) * bit

    return jax.lax.fori_loop(0, n_diag, body, th0)


def _gud_loop(gth, signs_blk, n_diag, lane_ids):
    """Reduce the per-element phase gradient field gth to the [1, 128]
    per-slot row: slot k gets sum(gth·sign_k) = s0 - 2·sum(gth·bit_k),
    slot n_diag (the offset column) gets s0."""
    s0 = jnp.sum(gth)
    gud = jnp.zeros((1, _LANES), jnp.float32)
    if n_diag:
        def body(k, gud):
            plane = _sel_plane(signs_blk, k // _PLANE_BITS)
            bit = jnp.bitwise_and(
                jax.lax.shift_right_logical(plane, jnp.mod(k, _PLANE_BITS).astype(jnp.int32)),
                1).astype(jnp.float32)
            return gud + jnp.where(lane_ids == k,
                                   s0 - 2.0 * jnp.sum(gth * bit), 0.0)

        gud = jax.lax.fori_loop(0, n_diag, body, gud)
    return gud + jnp.where(lane_ids == n_diag, s0, 0.0)


# ---------------------------------------------------------------------------
# pass cores
# ---------------------------------------------------------------------------

def _a_fwd(re2, im2, udm_row, txp_row, txc_row, h0_blk, sg_blk,
           tbla, ka, n_diag, f, fast):
    """Merged pass-A sweep on a [F, 128] slab: previous step's reversed
    half-rotations, the merged diagonal phase, the current step's forward
    half-rotations."""
    fdim = re2.shape[0]
    re = re2.reshape(1, fdim, _LANES)
    im = im2.reshape(1, fdim, _LANES)
    re, im = _sweep_fwd(re, im, tbla, txp_row, ka, 0, f, fast,
                        reverse=True)
    th = _theta_loop(udm_row, h0_blk, sg_blk, n_diag).reshape(
        1, fdim, _LANES)
    cph, sph = jnp.cos(th), jnp.sin(th)
    re, im = cph * re + sph * im, cph * im - sph * re
    re, im = _sweep_fwd(re, im, tbla, txc_row, ka, 0, f, fast,
                        reverse=False)
    return re.reshape(fdim, _LANES), im.reshape(fdim, _LANES)


def _a_bwd(y_re2, y_im2, l_re2, l_im2, udm_row, txp_row, txc_row, h0_blk,
           sg_blk, tbla, ka, n_diag, f, fast):
    """Invert one merged pass-A sweep; returns (y, l planes, gud_row,
    gtxc_row, gtxp_row)."""
    fdim = y_re2.shape[0]
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    shp3 = (1, fdim, _LANES)
    y_re, y_im = y_re2.reshape(shp3), y_im2.reshape(shp3)
    l_re, l_im = l_re2.reshape(shp3), l_im2.reshape(shp3)
    gz = jnp.zeros((1, _LANES), jnp.float32)
    # undo the trailing forward-order sweep: process reversed
    y_re, y_im, l_re, l_im, gtxc = _sweep_bwd(
        y_re, y_im, l_re, l_im, gz, tbla, txc_row, ka, 0, f, fast,
        reverse=True)
    # undo the merged phase
    th = _theta_loop(udm_row, h0_blk, sg_blk, n_diag).reshape(shp3)
    cph, sph = jnp.cos(th), jnp.sin(th)
    gth = l_re * y_im - l_im * y_re
    gud = _gud_loop(gth, sg_blk, n_diag, lane_ids)
    y_re, y_im = (cph * y_re - sph * y_im, sph * y_re + cph * y_im)
    l_re, l_im = (cph * l_re - sph * l_im, sph * l_re + cph * l_im)
    # undo the leading reversed sweep: process forward
    y_re, y_im, l_re, l_im, gtxp = _sweep_bwd(
        y_re, y_im, l_re, l_im, gz, tbla, txp_row, ka, 0, f, fast,
        reverse=False)
    sq = lambda v: v.reshape(fdim, _LANES)  # noqa: E731
    return (sq(y_re), sq(y_im), sq(l_re), sq(l_im), gud, gtxc, gtxp)


# ---------------------------------------------------------------------------
# mega kernels (one pallas_call per direction, manual DMA)
# ---------------------------------------------------------------------------

def _make_mega_hop_fwd(ka, kb, n_diag, c, f, bf, fast, n_steps, b_commute):
    cdim, fdim = 2**c, 2**f
    nsl = fdim // bf
    nbb = int(np.log2(bf))
    has_b = kb > 0

    def kernel(udm_ref, txp_ref, txc_ref, txb_ref, tbla_ref, tblb_ref,
               h0_hbm, sg_hbm, in_re, in_im, out_re, out_im,
               a_re, a_im, a_h0, a_sg, b_re, b_im, sem):
        t = pl.program_id(0)

        if has_b:
            tblb = tblb_ref[:]

            @pl.when(t > 0)
            def _():
                def bodyB(s, _):
                    o = s * bf
                    c1 = _mega_copy(out_re.at[:, pl.ds(o, bf)], b_re, sem, 0)
                    c2 = _mega_copy(out_im.at[:, pl.ds(o, bf)], b_im, sem, 1)
                    c1.wait()
                    c2.wait()
                    re, im = _sweep_fwd(b_re[:], b_im[:], tblb, txb_ref[0],
                                        kb, c, nbb, fast, reverse=False)
                    if not b_commute:
                        re, im = _sweep_fwd(re, im, tblb, txb_ref[0],
                                            kb, c, nbb, fast, reverse=True)
                    b_re[:] = re
                    b_im[:] = im
                    c3 = _mega_copy(b_re, out_re.at[:, pl.ds(o, bf)], sem, 0)
                    c4 = _mega_copy(b_im, out_im.at[:, pl.ds(o, bf)], sem, 1)
                    c3.wait()
                    c4.wait()
                    return 0

                jax.lax.fori_loop(0, nsl, bodyB, 0)

        tbla = tbla_ref[:]

        def bodyA(q, _):
            cps = [_mega_copy(out_re.at[q], a_re, sem, 0),
                   _mega_copy(out_im.at[q], a_im, sem, 1),
                   _mega_copy(h0_hbm.at[q], a_h0, sem, 2),
                   _mega_copy(sg_hbm.at[q], a_sg, sem, 3)]
            for cp in cps:
                cp.wait()
            re, im = _a_fwd(a_re[:], a_im[:], udm_ref[0], txp_ref[0],
                            txc_ref[0], a_h0[:], a_sg[:], tbla, ka,
                            n_diag, f, fast)
            a_re[:] = re
            a_im[:] = im
            c5 = _mega_copy(a_re, out_re.at[q], sem, 0)
            c6 = _mega_copy(a_im, out_im.at[q], sem, 1)
            c5.wait()
            c6.wait()
            return 0

        jax.lax.fori_loop(0, cdim, bodyA, 0)

    return kernel


def _make_mega_hop_bwd(ka, kb, n_diag, c, f, bf, fast, n_steps, b_commute):
    cdim, fdim = 2**c, 2**f
    nsl = fdim // bf
    nbb = int(np.log2(bf))
    has_b = kb > 0

    def kernel(udm_ref, txp_ref, txc_ref, txb_ref, tbla_ref, tblb_ref,
               h0_hbm, sg_hbm, yT_re, yT_im, lT_re, lT_im,
               y_re_o, y_im_o, l_re_o, l_im_o, gudm_ref, gtxc_ref,
               gtxp_ref, gtxb_ref, ay_re, ay_im, al_re, al_im, a_h0,
               a_sg, by_re, by_im, bl_re, bl_im, acc_ud, acc_tc, acc_tp,
               acc_tb, sem):
        i = pl.program_id(0)  # inverts pass A of step s = n_steps - i,
                              # then pass B of step s - 1
        tbla = tbla_ref[:]

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
            (y_re, y_im, l_re, l_im, gud, gtxc, gtxp) = _a_bwd(
                ay_re[:], ay_im[:], al_re[:], al_im[:], udm_ref[0],
                txp_ref[0], txc_ref[0], a_h0[:], a_sg[:], tbla, ka,
                n_diag, f, fast)
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
            tblb = tblb_ref[:]

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
                    grow = jnp.zeros((1, _LANES), jnp.float32)
                    y_re, y_im = by_re[:], by_im[:]
                    l_re, l_im = bl_re[:], bl_im[:]
                    if not b_commute:
                        # undo the trailing reversed half-sweep: process
                        # forward order
                        y_re, y_im, l_re, l_im, grow = _sweep_bwd(
                            y_re, y_im, l_re, l_im, grow, tblb,
                            txb_ref[0], kb, c, nbb, fast, reverse=False)
                    # undo the leading forward sweep: process reversed
                    y_re, y_im, l_re, l_im, grow = _sweep_bwd(
                        y_re, y_im, l_re, l_im, grow, tblb, txb_ref[0],
                        kb, c, nbb, fast, reverse=True)
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
    tbl_a, ka, tbl_b, kb, b_commute = _op_tables(
        tuple(x_entries), tuple(kinds), n_qubits, c, f)
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
    return (c, f, cdim, fdim, bf, tbl_a, ka, tbl_b, kb, b_commute,
            n_steps, n_diag, interp, udm, txp, txc, txb, h0th3, signs3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def chunked_evolve_mega_hop(psi0: CP, ud: jnp.ndarray, theta_x: jnp.ndarray,
                            h0th: jnp.ndarray, signs: jnp.ndarray,
                            x_entries: tuple, n_qubits: int,
                            kinds: tuple = None,
                            fast_math: bool = False) -> CP:
    """Hop-capable mega chunked evolution (palindromic pass schedule,
    table-driven sweeps).

    Inputs mirror :func:`.fused_chunked.chunked_evolve_mega`; ``x_entries``
    holds ints (1q) or (i, j) position pairs (hops) in the ALREADY
    RELABELED position space (see :func:`plan_chunked_hop_layout` — the
    wrapper in dynamics/product.py permutes the state / sign planes)."""
    return _forward_hop(psi0, ud, theta_x, h0th, signs, x_entries,
                        n_qubits, kinds, fast_math)


def _forward_hop(psi0, ud, theta_x, h0th, signs, x_entries, n_qubits,
                 kinds=None, fast_math=False):
    (c, f, cdim, fdim, bf, tbl_a, ka, tbl_b, kb, b_commute, n_steps,
     n_diag, interp, udm, txp, txc, txb, h0th3, signs3) = _setup_hop(
        ud, theta_x, h0th, signs, x_entries, n_qubits, kinds, fast_math)
    kernel = _make_mega_hop_fwd(ka, kb, n_diag, c, f, bf, fast_math,
                                n_steps, b_commute)
    row = pl.BlockSpec((1, 1, _LANES), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    tspec = lambda t: pl.BlockSpec(  # noqa: E731
        t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    shp = (cdim, fdim, _LANES)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(n_steps + 1,),
        in_specs=[row, row, row, row, tspec(tbl_a), tspec(tbl_b), anyspec,
                  anyspec, anyspec, anyspec],
        out_specs=(anyspec, anyspec),
        out_shape=(jax.ShapeDtypeStruct(shp, jnp.float32),
                   jax.ShapeDtypeStruct(shp, jnp.float32)),
        input_output_aliases={8: 0, 9: 1},
        scratch_shapes=[pltpu.VMEM((fdim, _LANES), jnp.float32),
                        pltpu.VMEM((fdim, _LANES), jnp.float32),
                        pltpu.VMEM((fdim, _LANES), jnp.float32),
                        pltpu.VMEM((signs3.shape[1], fdim, _LANES),
                                   jnp.int32),
                        pltpu.VMEM((cdim, bf, _LANES), jnp.float32),
                        pltpu.VMEM((cdim, bf, _LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA((4,))],
        interpret=interp,
        **_hop_vmem(),
    )(udm, txp, txc, txb, jnp.asarray(tbl_a), jnp.asarray(tbl_b), h0th3,
      signs3, psi0.re.reshape(shp).astype(jnp.float32),
      psi0.im.reshape(shp).astype(jnp.float32))
    d = 2**n_qubits
    return CP(out_re.reshape(d), out_im.reshape(d))


def _fwd_hop(psi0, ud, theta_x, h0th, signs, x_entries, n_qubits,
             kinds=None, fast_math=False):
    out = _forward_hop(psi0, ud, theta_x, h0th, signs, x_entries, n_qubits,
                       kinds, fast_math)
    return out, (out, ud, theta_x, h0th, signs)


def _bwd_hop(x_entries, n_qubits, kinds, fast_math, residuals, lam):
    psi_T, ud, theta_x, h0th, signs = residuals
    (c, f, cdim, fdim, bf, tbl_a, ka, tbl_b, kb, b_commute, n_steps,
     n_diag, interp, udm, txp, txc, txb, h0th3, signs3) = _setup_hop(
        ud, theta_x, h0th, signs, x_entries, n_qubits, kinds, fast_math)
    kernel = _make_mega_hop_bwd(ka, kb, n_diag, c, f, bf, fast_math,
                                n_steps, b_commute)
    grow = pl.BlockSpec((1, 1, _LANES), lambda i: (n_steps - i, 0, 0),
                        memory_space=pltpu.VMEM)
    tspec = lambda t: pl.BlockSpec(  # noqa: E731
        t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    shp = (cdim, fdim, _LANES)
    st = jax.ShapeDtypeStruct(shp, jnp.float32)
    gr = jax.ShapeDtypeStruct((n_steps + 1, 1, _LANES), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(n_steps + 1,),
        in_specs=[grow, grow, grow, grow, tspec(tbl_a), tspec(tbl_b),
                  anyspec, anyspec, anyspec, anyspec, anyspec, anyspec],
        out_specs=(anyspec, anyspec, anyspec, anyspec, grow, grow, grow,
                   grow),
        out_shape=(st, st, st, st, gr, gr, gr, gr),
        input_output_aliases={8: 0, 9: 1, 10: 2, 11: 3},
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
        **_hop_vmem(),
    )(udm, txp, txc, txb, jnp.asarray(tbl_a), jnp.asarray(tbl_b), h0th3,
      signs3, psi_T.re.reshape(shp).astype(jnp.float32),
      psi_T.im.reshape(shp).astype(jnp.float32),
      lam.re.reshape(shp).astype(jnp.float32),
      lam.im.reshape(shp).astype(jnp.float32))
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
    carries input qubit ``perm[p]`` — transparent to autodiff. Identity
    permutations return x unchanged.

    The bits are grouped into maximal CONSECUTIVE source runs and the
    transpose operates on those groups: the layout planner's permutations
    are a handful of monotone runs (chunk block + relocated neighbor
    block + tails), so this is a small-rank transpose with a LARGE minor
    axis. The naive (2,)*n form puts size-2 dims in the two minor
    positions, which XLA pads to full (8/2, 128) tiles — a chip-measured
    64x memory expansion that OOMed 16 GB of HBM permuting the int32
    sign planes at 24 qubits."""
    n = len(perm)
    if tuple(perm) == tuple(range(n)):
        return x
    runs = []  # (source_start, length), in OUTPUT order
    s, ln = perm[0], 1
    for p in perm[1:]:
        if p == s + ln:
            ln += 1
        else:
            runs.append((s, ln))
            s, ln = p, 1
    runs.append((s, ln))
    order = sorted(range(len(runs)), key=lambda i: runs[i][0])
    sizes = tuple(2 ** runs[i][1] for i in order)  # source-ordered dims
    src_axis_of_run = {run_id: ax for ax, run_id in enumerate(order)}
    lead = x.shape[:-1]
    k = len(lead)
    y = x.reshape(lead + sizes)
    y = jnp.transpose(y, tuple(range(k)) + tuple(
        k + src_axis_of_run[j] for j in range(len(runs))))
    return y.reshape(lead + (2**n,))


def invert_perm(perm):
    inv = [0] * len(perm)
    for p, q in enumerate(perm):
        inv[q] = p
    return tuple(inv)
