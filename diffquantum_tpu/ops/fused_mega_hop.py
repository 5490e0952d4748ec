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
sweeps are a ``lax.fori_loop`` over an OP TABLE: one compiled rotation
body, ops as runtime data.

**Round-5 rework (the 66x tax).** BENCH_r04 measured the table-driven
sweeps at 1961 ms/step for the 20q molecule set vs 29.9 ms for the
hop-free engine — ~14x per control. The overhead was structural, not
arithmetic, and is attacked here:

- op tables and per-step angle rows live in **SMEM** and are read as
  direct scalar loads (``tbl[kk, col]``); the old VMEM tables needed a
  masked-sum row extraction plus 14 vector→scalar reductions per op;
- runtime XOR flips are **lax.cond-gated per bit**: an op touching 1-2
  block-axis bits pays 1-2 flip copies instead of the old unconditional
  nb0+nb1 flip+select chain (10+ full-slab passes per plane per op);
- the lane matmul runs **only when the op has a lane component** (the
  old path multiplied every op by an identity permutation — a wasted
  [2F,128]x[128,128] HIGHEST-precision matmul per non-lane op);
- op bodies are **kind-specialized** behind a scalar 3-way branch
  (x / y / hop): X ops skip the Y-twist selects and the hop-mask
  iota builds; Y ops skip the mask; hops skip the twist.

Uniformity of the compiled body is preserved: every branch of every cond
is compiled once per sweep, ops remain runtime data.

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
24-qubit single-chip frontier — and the batched form
(:func:`chunked_evolve_mega_hop_batched`) carries whole seed populations
as ONE compiled kernel (round 4 Python-looped per seed).
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

# op-table column layout ([Kpad, _TBL_W] int32 in SMEM, one row per op)
_C_SLOT = 0    # angle column in the [1, 128] angle rows
_C_M0 = 1      # XOR flip mask, block axis 0 (chunk) — LSB bit convention
_C_M1 = 2      # XOR flip mask, block axis 1 (free / low-free)
_C_LMASK = 3   # lane XOR mask (perm matrix built in-kernel from iotas)
_C_TW0, _C_TW1, _C_TW2 = 4, 5, 6   # Y-twist bit shift per axis (31 = off)
_C_ISHOP = 7   # 1 => per-element hop mask applies (else m ≡ 1)
_C_HA0, _C_HA1, _C_HA2 = 8, 9, 10   # hop bit 1: shift per axis (31 = off)
_C_HB0, _C_HB1, _C_HB2 = 11, 12, 13  # hop bit 2
_C_KIND = 14   # 0 = x, 1 = y, 2 = hop (scalar 3-way branch selector)
_INACTIVE = 31  # >> 31 of any block-axis index yields 0
_TBL_W = 16     # padded row width (int32 SMEM — 8 KB at 128 ops)


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
    """Build the pass-A/pass-B op tables ([Kpad, _TBL_W] int32 rows, see
    the _C_* column map) plus the B-commutation flag. Bit conventions
    (LSB index bits of each block axis): position p < c → axis 0 bit
    c-1-p; c <= p < c+f → axis 1 bit f-1-(p-c) (pass B sees only the low
    log2(bf) of these — guaranteed by :func:`_assign_passes`); lane
    position → axis 2 bit n-1-p."""
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
            r = np.zeros(_TBL_W, np.int32)
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
                r[_C_KIND] = 1
            elif kd == "hop":
                r[_C_ISHOP] = 1
                r[_C_KIND] = 2
                for cols, p in (((_C_HA0, _C_HA1, _C_HA2), ps[0]),
                                ((_C_HB0, _C_HB1, _C_HB2), ps[1])):
                    ax, sh = bit_axes(p)
                    r[cols[ax]] = sh
            rows.append(r)
        k = len(rows)
        kpad = max(8, -(-k // 8) * 8)
        tbl = np.zeros((kpad, _TBL_W), np.int32)
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


def _mm(m, x):
    """m ⊙ x with static identity elision (m is None for tables that
    carry no hop rows — the multiply disappears at trace time)."""
    return x if m is None else m * x


def _lane_dot_refs(t_refs, lmask, fast):
    """ONE packed lane matmul over all temp planes, executed only when
    the op has a lane component (pl.when — round 4 multiplied every op
    by an identity permutation, a wasted [kR,128]x[128,128]
    HIGHEST-precision matmul per non-lane op)."""
    @pl.when(lmask > 0)
    def _():
        pm = _lane_perm(lmask)
        shp = t_refs[0].shape
        rr = int(np.prod(shp[:-1]))
        out = _pdot(jnp.concatenate([t[:].reshape(rr, _LANES)
                                     for t in t_refs], axis=0), pm, fast)
        for i, t in enumerate(t_refs):
            t[:] = jax.lax.slice_in_dim(out, i * rr, (i + 1) * rr,
                                        axis=0).reshape(shp)


def _op_motion(t_refs, g, nb0, nb1, flip, fast):
    """Move the temp planes by the op's runtime XOR masks + lane
    permutation. Per-bit flips fire under pl.when — an op touching 1-2
    block-axis bits pays 1-2 flip passes instead of round 4's
    unconditional nb0+nb1 flip+select chain per plane."""
    m0, m1 = g(_C_M0), g(_C_M1)
    for ax, mreg, nb in ((0, m0, nb0), (1, m1, nb1)):
        for j in range(nb):
            bit = jnp.bitwise_and(
                jax.lax.shift_right_logical(mreg, np.int32(j)),
                np.int32(1))

            @pl.when(bit == 1)
            def _(ax=ax, j=j):
                for t in t_refs:
                    t[:] = flip(t[:], ax, j)

    _lane_dot_refs(t_refs, g(_C_LMASK), fast)


def _flip_free(v, ax, j):
    """Pair-swap LSB index bit ``j`` of the FREE axis of a rank-2
    [F, 128] pass-A plane (``ax`` is always 1 there — pass-A ops carry
    no chunk-axis bits by construction)."""
    f, l = v.shape
    hi = f >> (j + 1)
    y = v.reshape(hi, 2, f // (2 * hi), l)
    y = jnp.concatenate([y[:, 1:2], y[:, 0:1]], axis=1)
    return y.reshape(f, l)


def _mk_bitnd(shape, rank3):
    """Per-element table-bit evaluator for the pass geometry: returns
    ``bitnd(s0, s1, s2) -> ((I0>>s0) ^ (I1>>s1) ^ (I2>>s2)) & 1`` with
    runtime shifts (31 parks an axis). Rank-2 pass-A planes have no
    chunk axis — s0 is parked for every pass-A op and is ignored."""
    if rank3:
        i0, i1, i2 = (jax.lax.broadcasted_iota(jnp.int32, shape, a)
                      for a in range(3))

        def bitnd(s0, s1, s2):
            v = jnp.bitwise_xor(
                jnp.bitwise_xor(jax.lax.shift_right_logical(i0, s0),
                                jax.lax.shift_right_logical(i1, s1)),
                jax.lax.shift_right_logical(i2, s2))
            return jnp.bitwise_and(v, 1)
    else:
        i1, i2 = (jax.lax.broadcasted_iota(jnp.int32, shape, a)
                  for a in range(2))

        def bitnd(s0, s1, s2):
            v = jnp.bitwise_xor(jax.lax.shift_right_logical(i1, s1),
                                jax.lax.shift_right_logical(i2, s2))
            return jnp.bitwise_and(v, 1)
    return bitnd


def _i32(x):
    return x.astype(jnp.int32) if hasattr(x, "astype") else jnp.int32(x)


def _sweep_fwd(s_re, s_im, t_re, t_im, tbl_ref, ang_read, k_ops, nb0, nb1,
               flip, bitnd, flags, fast, reverse):
    """Forward table sweep over ``k_ops`` ops, REF-mutating: state planes
    ``s_re/s_im`` are updated in place, ``t_re/t_im`` hold the generator
    motion G(state). ``tbl_ref`` is the SMEM op table (direct scalar
    reads); ``ang_read(slot)`` reads the op's angle (already half-angled
    by the driver) from the SMEM angle row; ``reverse`` iterates the
    table backwards (the palindromic sweeps). ``flags`` = (has_hop,
    has_y), static — tables without hops skip the parity-mask build,
    without Ys the sign blend."""
    if k_ops == 0:
        return
    has_hop, has_y = flags

    def body(k, _):
        kk = _i32((k_ops - 1 - k) if reverse else k)
        g = lambda col: tbl_ref[kk, col]  # noqa: E731
        th = ang_read(g(_C_SLOT))
        cth, sth = jnp.cos(th), jnp.sin(th)
        t_re[:] = s_re[:]
        t_im[:] = s_im[:]
        _op_motion((t_re, t_im), g, nb0, nb1, flip, fast)
        m = None
        if has_hop:
            par = jnp.bitwise_xor(
                bitnd(g(_C_HA0), g(_C_HA1), g(_C_HA2)),
                bitnd(g(_C_HB0), g(_C_HB1), g(_C_HB2))
            ).astype(jnp.float32)
            m = 1.0 + g(_C_ISHOP).astype(jnp.float32) * (par - 1.0)
        gre, gim = t_re[:], t_im[:]
        if has_y:
            # Y = signed permutation: K = sgn ⊙ G, sgn = 2·bit_q − 1;
            # the blend replaces a vector select (no Mosaic lowering)
            ysel = (g(_C_KIND) == 1).astype(jnp.float32)
            sgn = 2.0 * bitnd(g(_C_TW0), g(_C_TW1),
                              g(_C_TW2)).astype(jnp.float32) - 1.0
            a = (1.0 - ysel) * gim + (ysel * sgn) * gre
            b = (ysel - 1.0) * gre + (ysel * sgn) * gim
        else:
            a, b = gim, -gre
        ct = cth if m is None else 1.0 + m * (cth - 1.0)
        nre = ct * s_re[:] + sth * _mm(m, a)
        nim = ct * s_im[:] + sth * _mm(m, b)
        s_re[:] = nre
        s_im[:] = nim
        return 0

    jax.lax.fori_loop(0, k_ops, body, 0)


def _sweep_bwd(y_re, y_im, l_re, l_im, t1, t2, t3, t4, acc, tbl_ref,
               ang_read, k_ops, nb0, nb1, flip, bitnd, flags, fast,
               reverse):
    """Inverse table sweep, REF-mutating: reconstructs the pre-sweep
    state, evolves the cotangent, accumulates per-slot angle gradients
    into the ``acc`` [1, 128] ref. ``reverse`` is the PROCESSING order
    (undoing a forward-order sweep processes ops reversed, and vice
    versa). G(x) derives from the computed G(y) via the involution
    identities — 4 generator applications per op, all riding ONE packed
    lane matmul (t1..t4 = G(y_re), G(y_im), G(l_im), G(l_re))."""
    if k_ops == 0:
        return
    has_hop, has_y = flags
    i1r = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    def body(k, _):
        kk = _i32((k_ops - 1 - k) if reverse else k)
        g = lambda col: tbl_ref[kk, col]  # noqa: E731
        slot = g(_C_SLOT)
        thx = ang_read(slot)
        cx, sx = jnp.cos(thx), jnp.sin(thx)
        t1[:] = y_re[:]
        t2[:] = y_im[:]
        t3[:] = l_im[:]
        t4[:] = l_re[:]
        _op_motion((t1, t2, t3, t4), g, nb0, nb1, flip, fast)
        m = None
        if has_hop:
            par = jnp.bitwise_xor(
                bitnd(g(_C_HA0), g(_C_HA1), g(_C_HA2)),
                bitnd(g(_C_HB0), g(_C_HB1), g(_C_HB2))
            ).astype(jnp.float32)
            m = 1.0 + g(_C_ISHOP).astype(jnp.float32) * (par - 1.0)
        T1, T2, T3, T4 = t1[:], t2[:], t3[:], t4[:]
        if has_y:
            ysel = (g(_C_KIND) == 1).astype(jnp.float32)
            sgn = 2.0 * bitnd(g(_C_TW0), g(_C_TW1),
                              g(_C_TW2)).astype(jnp.float32) - 1.0
            ys = ysel * sgn
            a1 = (1.0 - ysel) * _mm(m, T2) + ys * T1
            a2 = (1.0 - ysel) * _mm(m, T1) - ys * T2
            a3 = (1.0 - ysel) * _mm(m, T3) + ys * T4
            a4 = (1.0 - ysel) * _mm(m, T4) - ys * T3
        else:
            a1, a2, a3, a4 = (_mm(m, T2), _mm(m, T1),
                              _mm(m, T3), _mm(m, T4))
        ct = cx if m is None else 1.0 + m * (cx - 1.0)
        x_re = ct * y_re[:] - sx * a1
        x_im = ct * y_im[:] + sx * a2
        # involution identities: the gradient's G(x) terms follow from
        # the already-moved planes (g1/g2 are the blended gx fields)
        g1 = cx * a1 + sx * _mm(m, y_re[:])
        g2 = -cx * a2 + sx * _mm(m, y_im[:])
        contrib = (l_re[:] * (-sx * _mm(m, x_re) + cx * g1)
                   + l_im[:] * (-sx * _mm(m, x_im) + cx * g2))
        nl_re = ct * l_re[:] - sx * a3
        nl_im = ct * l_im[:] + sx * a4
        y_re[:] = x_re
        y_im[:] = x_im
        l_re[:] = nl_re
        l_im[:] = nl_im
        acc[:] = acc[:] + jnp.where(i1r == slot, jnp.sum(contrib), 0.0)
        return 0

    jax.lax.fori_loop(0, k_ops, body, 0)


def _theta_loop(ud_read, h0_blk, sg_blk, n_diag):
    """Per-slab diagonal phase from SMEM angle scalars (row layout
    [a_0..a_{n_diag-1}, offset, h0_mult]): a static outer loop over sign
    planes (≤ 4) with a fori_loop over that plane's terms — the plane is
    a STATIC index, deleting round 4's per-term P-way plane-select chain
    (P extra slab passes per term)."""
    th = ud_read(n_diag + 1) * h0_blk + ud_read(n_diag)
    for p in range(sg_blk.shape[0]):
        lo, hi = p * _PLANE_BITS, min(n_diag, (p + 1) * _PLANE_BITS)
        if lo >= hi:
            break
        plane = sg_blk[p]

        def body(k, th, plane=plane, lo=lo):
            a = ud_read(_i32(k))
            bit = jnp.bitwise_and(
                jax.lax.shift_right_logical(plane, _i32(k - lo)),
                np.int32(1)).astype(jnp.float32)
            return th + a - (2.0 * a) * bit

        th = jax.lax.fori_loop(lo, hi, body, th)
    return th


def _gud_loop(gth, sg_blk, n_diag, lane_ids):
    """Reduce the per-element phase gradient field gth to the [1, 128]
    per-slot row: slot k gets sum(gth·sign_k) = s0 - 2·sum(gth·bit_k),
    slot n_diag (the offset column) gets s0. Same static-plane outer
    loop as :func:`_theta_loop`."""
    s0 = jnp.sum(gth)
    gud = jnp.zeros((1, _LANES), jnp.float32)
    for p in range(sg_blk.shape[0]):
        lo, hi = p * _PLANE_BITS, min(n_diag, (p + 1) * _PLANE_BITS)
        if lo >= hi:
            break
        plane = sg_blk[p]

        def body(k, gud, plane=plane, lo=lo):
            bit = jnp.bitwise_and(
                jax.lax.shift_right_logical(plane, _i32(k - lo)),
                np.int32(1)).astype(jnp.float32)
            return gud + jnp.where(lane_ids == _i32(k),
                                   s0 - 2.0 * jnp.sum(gth * bit), 0.0)

        gud = jax.lax.fori_loop(lo, hi, body, gud)
    return gud + jnp.where(lane_ids == n_diag, s0, 0.0)


# ---------------------------------------------------------------------------
# pass cores (ref-mutating)
# ---------------------------------------------------------------------------

def _a_fwd(a_re, a_im, ta_re, ta_im, ud_read, txp_read, txc_read, a_h0,
           a_sg, tbla_ref, ka, n_diag, f, flags, fast):
    """Merged pass-A sweep on a [F, 128] slab (in place): previous step's
    reversed half-rotations, the merged diagonal phase, the current
    step's forward half-rotations."""
    bitnd = _mk_bitnd(a_re.shape, rank3=False)
    _sweep_fwd(a_re, a_im, ta_re, ta_im, tbla_ref, txp_read, ka, 0, f,
               _flip_free, bitnd, flags, fast, reverse=True)
    th = _theta_loop(ud_read, a_h0[:], a_sg[:], n_diag)
    cph, sph = jnp.cos(th), jnp.sin(th)
    nre = cph * a_re[:] + sph * a_im[:]
    nim = cph * a_im[:] - sph * a_re[:]
    a_re[:] = nre
    a_im[:] = nim
    _sweep_fwd(a_re, a_im, ta_re, ta_im, tbla_ref, txc_read, ka, 0, f,
               _flip_free, bitnd, flags, fast, reverse=False)


def _a_bwd(ay_re, ay_im, al_re, al_im, t1, t2, t3, t4, acc_ud, acc_tc,
           acc_tp, ud_read, txp_read, txc_read, a_h0, a_sg, tbla_ref, ka,
           n_diag, f, flags, fast):
    """Invert one merged pass-A sweep in place; gradients accumulate into
    the acc_* [1, 128] refs."""
    bitnd = _mk_bitnd(ay_re.shape, rank3=False)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    # undo the trailing forward-order sweep: process reversed
    _sweep_bwd(ay_re, ay_im, al_re, al_im, t1, t2, t3, t4, acc_tc,
               tbla_ref, txc_read, ka, 0, f, _flip_free, bitnd, flags,
               fast, reverse=True)
    # undo the merged phase
    th = _theta_loop(ud_read, a_h0[:], a_sg[:], n_diag)
    cph, sph = jnp.cos(th), jnp.sin(th)
    gth = al_re[:] * ay_im[:] - al_im[:] * ay_re[:]
    acc_ud[:] = acc_ud[:] + _gud_loop(gth, a_sg[:], n_diag, lane_ids)
    ny_re = cph * ay_re[:] - sph * ay_im[:]
    ny_im = sph * ay_re[:] + cph * ay_im[:]
    nl_re = cph * al_re[:] - sph * al_im[:]
    nl_im = sph * al_re[:] + cph * al_im[:]
    ay_re[:] = ny_re
    ay_im[:] = ny_im
    al_re[:] = nl_re
    al_im[:] = nl_im
    # undo the leading reversed sweep: process forward
    _sweep_bwd(ay_re, ay_im, al_re, al_im, t1, t2, t3, t4, acc_tp,
               tbla_ref, txp_read, ka, 0, f, _flip_free, bitnd, flags,
               fast, reverse=False)


# ---------------------------------------------------------------------------
# mega kernels (one pallas_call per direction, manual DMA)
# ---------------------------------------------------------------------------

def _make_mega_hop_fwd(ka, kb, n_diag, c, f, bf, fast, n_steps, b_commute,
                       flags_a, flags_b, batched=False):
    """``batched=True`` grids over (B, n_steps + 1) seed-major: seed b is
    program_id(0), its state lives at index b of the leading axis of the
    HBM-resident planes, and its (flattened, t-major) SMEM angle rows are
    selected by the BlockSpec index maps — one compiled kernel for the
    whole seed population (round 4 Python-looped per seed)."""
    cdim, fdim = 2**c, 2**f
    nsl = fdim // bf
    nbb = int(np.log2(bf))
    has_b = kb > 0

    def kernel(udm_ref, txp_ref, txc_ref, txb_ref, tbla_ref, tblb_ref,
               h0_hbm, sg_hbm, in_re, in_im, out_re, out_im,
               a_re, a_im, ta_re, ta_im, a_h0, a_sg,
               b_re, b_im, tb_re, tb_im, sem):
        if batched:
            bb = pl.program_id(0)
            t = pl.program_id(1)
            st_q = lambda arr, q: arr.at[bb, q]                # noqa: E731
            st_f = lambda arr, o: arr.at[bb, :, pl.ds(o, bf)]  # noqa: E731
        else:
            t = pl.program_id(0)
            st_q = lambda arr, q: arr.at[q]                    # noqa: E731
            st_f = lambda arr, o: arr.at[:, pl.ds(o, bf)]      # noqa: E731
        rd = lambda ref: (lambda col: ref[0, 0, col])          # noqa: E731

        if has_b:
            @pl.when(t > 0)
            def _():
                def bodyB(s, _):
                    o = s * bf
                    c1 = _mega_copy(st_f(out_re, o), b_re, sem, 0)
                    c2 = _mega_copy(st_f(out_im, o), b_im, sem, 1)
                    c1.wait()
                    c2.wait()
                    bitnd = _mk_bitnd(b_re.shape, rank3=True)
                    _sweep_fwd(b_re, b_im, tb_re, tb_im, tblb_ref,
                               rd(txb_ref), kb, c, nbb, _flip3, bitnd,
                               flags_b, fast, reverse=False)
                    if not b_commute:
                        _sweep_fwd(b_re, b_im, tb_re, tb_im, tblb_ref,
                                   rd(txb_ref), kb, c, nbb, _flip3,
                                   bitnd, flags_b, fast, reverse=True)
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
            _a_fwd(a_re, a_im, ta_re, ta_im, rd(udm_ref), rd(txp_ref),
                   rd(txc_ref), a_h0, a_sg, tbla_ref, ka, n_diag, f,
                   flags_a, fast)
            c5 = _mega_copy(a_re, st_q(out_re, q), sem, 0)
            c6 = _mega_copy(a_im, st_q(out_im, q), sem, 1)
            c5.wait()
            c6.wait()
            return 0

        jax.lax.fori_loop(0, cdim, bodyA, 0)

    return kernel


def _make_mega_hop_bwd(ka, kb, n_diag, c, f, bf, fast, n_steps, b_commute,
                       flags_a, flags_b, batched=False):
    cdim, fdim = 2**c, 2**f
    nsl = fdim // bf
    nbb = int(np.log2(bf))
    has_b = kb > 0

    def kernel(udm_ref, txp_ref, txc_ref, txb_ref, tbla_ref, tblb_ref,
               h0_hbm, sg_hbm, yT_re, yT_im, lT_re, lT_im,
               y_re_o, y_im_o, l_re_o, l_im_o, gudm_ref, gtxc_ref,
               gtxp_ref, gtxb_ref, ay_re, ay_im, al_re, al_im,
               t1, t2, t3, t4, a_h0, a_sg,
               by_re, by_im, bl_re, bl_im, u1, u2, u3, u4,
               acc_ud, acc_tc, acc_tp, acc_tb, sem):
        if batched:
            bb = pl.program_id(0)
            i = pl.program_id(1)  # inverts pass A of step s = n_steps - i
            st_q = lambda arr, q: arr.at[bb, q]                # noqa: E731
            st_f = lambda arr, o: arr.at[bb, :, pl.ds(o, bf)]  # noqa: E731
        else:
            i = pl.program_id(0)
            st_q = lambda arr, q: arr.at[q]                    # noqa: E731
            st_f = lambda arr, o: arr.at[:, pl.ds(o, bf)]      # noqa: E731
        rd = lambda ref: (lambda col: ref[0, 0, col])          # noqa: E731

        acc_ud[:] = jnp.zeros((1, _LANES), jnp.float32)
        acc_tc[:] = jnp.zeros((1, _LANES), jnp.float32)
        acc_tp[:] = jnp.zeros((1, _LANES), jnp.float32)
        acc_tb[:] = jnp.zeros((1, _LANES), jnp.float32)

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
            _a_bwd(ay_re, ay_im, al_re, al_im, t1, t2, t3, t4, acc_ud,
                   acc_tc, acc_tp, rd(udm_ref), rd(txp_ref), rd(txc_ref),
                   a_h0, a_sg, tbla_ref, ka, n_diag, f, flags_a, fast)
            cps = [_mega_copy(ay_re, st_q(y_re_o, q), sem, 0),
                   _mega_copy(ay_im, st_q(y_im_o, q), sem, 1),
                   _mega_copy(al_re, st_q(l_re_o, q), sem, 2),
                   _mega_copy(al_im, st_q(l_im_o, q), sem, 3)]
            for cp in cps:
                cp.wait()
            return 0

        jax.lax.fori_loop(0, cdim, bodyA, 0)

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
                    bitnd = _mk_bitnd(by_re.shape, rank3=True)
                    if not b_commute:
                        # undo the trailing reversed half-sweep: process
                        # forward order
                        _sweep_bwd(by_re, by_im, bl_re, bl_im, u1, u2,
                                   u3, u4, acc_tb, tblb_ref, rd(txb_ref),
                                   kb, c, nbb, _flip3, bitnd, flags_b,
                                   fast, reverse=False)
                    # undo the leading forward sweep: process reversed
                    _sweep_bwd(by_re, by_im, bl_re, bl_im, u1, u2, u3,
                               u4, acc_tb, tblb_ref, rd(txb_ref), kb, c,
                               nbb, _flip3, bitnd, flags_b, fast,
                               reverse=True)
                    cps = [_mega_copy(by_re, st_f(y_re_o, o), sem, 0),
                           _mega_copy(by_im, st_f(y_im_o, o), sem, 1),
                           _mega_copy(bl_re, st_f(l_re_o, o), sem, 2),
                           _mega_copy(bl_im, st_f(l_im_o, o), sem, 3)]
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
    """Shared trace-time setup. ``ud`` / ``theta_x`` may carry a seed
    axis ([T, B, ...]); the angle-row arrays come out t-major flattened
    ([T+1 (*B), 128]) to match the SMEM BlockSpec index maps."""
    kinds = kinds or ("x",) * len(x_entries)
    c, f = _plan(n_qubits)
    cdim, fdim = 2**c, 2**f
    bf = min(2 ** (f - c) if c > 0 else fdim, fdim)
    tbl_a, ka, tbl_b, kb, b_commute = _op_tables(
        tuple(x_entries), tuple(kinds), n_qubits, c, f)
    n_steps, n_slots = ud.shape[0], ud.shape[-1]
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
    zrow = jnp.zeros((1,) + txh.shape[1:], jnp.float32)
    txp = jnp.concatenate([zrow, txh])        # [T+1, (B,) 128]
    txc = jnp.concatenate([txh, zrow])
    txb = jnp.concatenate([zrow, txbh])
    # flatten any seed axis t-major; Mosaic requires the trailing two
    # block dims to divide (8, 128) or EQUAL the array dims (even for
    # SMEM), so the rows ride as [(T+1)(*B), 1, 128] with (1, 1, 128)
    # blocks
    flat = lambda v: v.reshape(-1, 1, _LANES)  # noqa: E731
    udm, txp, txc, txb = flat(udm), flat(txp), flat(txc), flat(txb)

    h0th3 = h0th.reshape(cdim, fdim, _LANES).astype(jnp.float32)
    signs3 = jnp.moveaxis(
        signs.reshape(signs.shape[0], cdim, fdim, _LANES), 0, 1)
    # static per-table capability flags: no hop rows -> the parity-mask
    # build disappears from the compiled sweep body; no Y rows -> the
    # sign blend does (padded rows are zeros and do not trip these)
    flags_a = (bool(tbl_a[:, _C_ISHOP].any()),
               bool((tbl_a[:, _C_KIND] == 1).any()))
    flags_b = (bool(tbl_b[:, _C_ISHOP].any()),
               bool((tbl_b[:, _C_KIND] == 1).any()))
    return (c, f, cdim, fdim, bf, tbl_a, ka, tbl_b, kb, b_commute,
            n_steps, n_diag, interp, udm, txp, txc, txb, h0th3, signs3,
            flags_a, flags_b)


def _hop_specs(tbl_a, tbl_b, n_steps, bsz=None, rev=False):
    """(row_spec, table_specs): SMEM angle-row blocks ([1, 1, 128],
    indexed t-major — times bsz for the seed axis) and whole-array SMEM
    tables."""
    if bsz is None:
        if rev:
            row = pl.BlockSpec((1, 1, _LANES),
                               lambda i: (n_steps - i, 0, 0),
                               memory_space=pltpu.SMEM)
        else:
            row = pl.BlockSpec((1, 1, _LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM)
    else:
        if rev:
            row = pl.BlockSpec(
                (1, 1, _LANES),
                lambda b, i: ((n_steps - i) * bsz + b, 0, 0),
                memory_space=pltpu.SMEM)
        else:
            row = pl.BlockSpec((1, 1, _LANES),
                               lambda b, i: (i * bsz + b, 0, 0),
                               memory_space=pltpu.SMEM)
    nmaps = 1 if bsz is None else 2
    zmap = (lambda i: (0, 0)) if nmaps == 1 else (lambda b, i: (0, 0))
    tspec = lambda t: pl.BlockSpec(t.shape, zmap,  # noqa: E731
                                   memory_space=pltpu.SMEM)
    return row, tspec(tbl_a), tspec(tbl_b)


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


def _fwd_scratch(cdim, fdim, bf, signs3):
    # a_re, a_im, ta_re, ta_im, a_h0 | a_sg | b_re, b_im, tb_re, tb_im
    return ([pltpu.VMEM((fdim, _LANES), jnp.float32) for _ in range(5)]
            + [pltpu.VMEM((signs3.shape[1], fdim, _LANES), jnp.int32)]
            + [pltpu.VMEM((cdim, bf, _LANES), jnp.float32)
               for _ in range(4)]
            + [pltpu.SemaphoreType.DMA((4,))])


def _bwd_scratch(cdim, fdim, bf, signs3):
    # ay_re, ay_im, al_re, al_im, t1..t4, a_h0 | a_sg |
    # by_re, by_im, bl_re, bl_im, u1..u4 | acc_ud, acc_tc, acc_tp, acc_tb
    return ([pltpu.VMEM((fdim, _LANES), jnp.float32) for _ in range(9)]
            + [pltpu.VMEM((signs3.shape[1], fdim, _LANES), jnp.int32)]
            + [pltpu.VMEM((cdim, bf, _LANES), jnp.float32)
               for _ in range(8)]
            + [pltpu.VMEM((1, _LANES), jnp.float32) for _ in range(4)]
            + [pltpu.SemaphoreType.DMA((4,))])


def _forward_hop(psi0, ud, theta_x, h0th, signs, x_entries, n_qubits,
                 kinds=None, fast_math=False):
    (c, f, cdim, fdim, bf, tbl_a, ka, tbl_b, kb, b_commute, n_steps,
     n_diag, interp, udm, txp, txc, txb, h0th3, signs3, flags_a,
     flags_b) = _setup_hop(
        ud, theta_x, h0th, signs, x_entries, n_qubits, kinds, fast_math)
    kernel = _make_mega_hop_fwd(ka, kb, n_diag, c, f, bf, fast_math,
                                n_steps, b_commute, flags_a, flags_b)
    row, ta, tb = _hop_specs(tbl_a, tbl_b, n_steps)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    shp = (cdim, fdim, _LANES)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(n_steps + 1,),
        in_specs=[row, row, row, row, ta, tb, anyspec,
                  anyspec, anyspec, anyspec],
        out_specs=(anyspec, anyspec),
        out_shape=(jax.ShapeDtypeStruct(shp, jnp.float32),
                   jax.ShapeDtypeStruct(shp, jnp.float32)),
        input_output_aliases={8: 0, 9: 1},
        scratch_shapes=_fwd_scratch(cdim, fdim, bf, signs3),
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
     n_diag, interp, udm, txp, txc, txb, h0th3, signs3, flags_a,
     flags_b) = _setup_hop(
        ud, theta_x, h0th, signs, x_entries, n_qubits, kinds, fast_math)
    kernel = _make_mega_hop_bwd(ka, kb, n_diag, c, f, bf, fast_math,
                                n_steps, b_commute, flags_a, flags_b)
    # grid step i inverts step s = n_steps - i: angle rows stream in
    # REVERSE, matching the gradient-row outputs
    row, ta, tb = _hop_specs(tbl_a, tbl_b, n_steps, rev=True)
    grow = pl.BlockSpec((1, 1, _LANES), lambda i: (n_steps - i, 0, 0),
                        memory_space=pltpu.VMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    shp = (cdim, fdim, _LANES)
    st = jax.ShapeDtypeStruct(shp, jnp.float32)
    gr = jax.ShapeDtypeStruct((n_steps + 1, 1, _LANES), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(n_steps + 1,),
        in_specs=[row, row, row, row, ta, tb,
                  anyspec, anyspec, anyspec, anyspec, anyspec, anyspec],
        out_specs=(anyspec, anyspec, anyspec, anyspec, grow, grow, grow,
                   grow),
        out_shape=(st, st, st, st, gr, gr, gr, gr),
        input_output_aliases={8: 0, 9: 1, 10: 2, 11: 3},
        scratch_shapes=_bwd_scratch(cdim, fdim, bf, signs3),
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

    gud, gtx = _assemble_grads(gudm, gtxc, gtxp, gtxb, n_steps, b_commute)
    d = 2**n_qubits
    return (CP(outs[2].reshape(d), outs[3].reshape(d)),
            gud[..., :ud.shape[-1]].astype(ud.dtype),
            gtx[..., :theta_x.shape[-1]].astype(theta_x.dtype),
            jnp.zeros_like(h0th),
            np.zeros(signs.shape, dtype=jax.dtypes.float0))


def _assemble_grads(gudm, gtxc, gtxp, gtxb, n_steps, b_commute):
    """Fold the per-grid-step gradient rows back onto the per-step
    parameter rows (shared by the batched form — rows then carry a seed
    axis [T+1, B, 128]).

    Merged phase rows: row t (1<=t<=T-1) touches ud[t-1] and ud[t]; rows
    0 / T are the boundary half-phases of ud[0] / ud[T-1]. Rotation rows
    carry HALVED angles: theta/2 applied as txc at grid t and txp at grid
    t+1 (chain factor 0.5 each); pass-B rows likewise when palindromic."""
    gud = jnp.zeros((n_steps,) + gudm.shape[1:], jnp.float32)
    gud = gud.at[0].add(gudm[0])
    gud = gud.at[n_steps - 1].add(gudm[n_steps])
    if n_steps > 1:
        mid = gudm[1:n_steps]
        gud = gud.at[:-1].add(mid)
        gud = gud.at[1:].add(mid)
    gtx = 0.5 * (gtxc[:n_steps] + gtxp[1:])
    gtx = gtx + (0.5 if not b_commute else 1.0) * gtxb[1:]
    return gud, gtx


chunked_evolve_mega_hop.defvjp(_fwd_hop, _bwd_hop)


# ---------------------------------------------------------------------------
# batched (seed-population) form: grid (B, n_steps + 1), seed-major —
# mirrors fused_chunked.chunked_evolve_mega_batched (VERDICT r4 #4: the
# round-4 wrapper Python-looped this, compiling one ~1 min mega kernel
# PER SEED at 20q)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def chunked_evolve_mega_hop_batched(psi0: CP, ud: jnp.ndarray,
                                    theta_x: jnp.ndarray, h0th: jnp.ndarray,
                                    signs: jnp.ndarray, x_entries: tuple,
                                    n_qubits: int, kinds: tuple = None,
                                    fast_math: bool = False) -> CP:
    """Seed-batched :func:`chunked_evolve_mega_hop`: psi0 CP [B, 2^n],
    ud [n_steps, B, n_diag+1], theta_x [n_steps, B, n_x] — per-seed
    pulses, ONE compiled kernel for the whole population."""
    return _forward_hop_b(psi0, ud, theta_x, h0th, signs, x_entries,
                          n_qubits, kinds, fast_math)


def _forward_hop_b(psi0, ud, theta_x, h0th, signs, x_entries, n_qubits,
                   kinds=None, fast_math=False):
    (c, f, cdim, fdim, bf, tbl_a, ka, tbl_b, kb, b_commute, n_steps,
     n_diag, interp, udm, txp, txc, txb, h0th3, signs3, flags_a,
     flags_b) = _setup_hop(
        ud, theta_x, h0th, signs, x_entries, n_qubits, kinds, fast_math)
    bsz = ud.shape[1]
    kernel = _make_mega_hop_fwd(ka, kb, n_diag, c, f, bf, fast_math,
                                n_steps, b_commute, flags_a, flags_b,
                                batched=True)
    row, ta, tb = _hop_specs(tbl_a, tbl_b, n_steps, bsz=bsz)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    shp = (bsz, cdim, fdim, _LANES)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(bsz, n_steps + 1),
        in_specs=[row, row, row, row, ta, tb, anyspec,
                  anyspec, anyspec, anyspec],
        out_specs=(anyspec, anyspec),
        out_shape=(jax.ShapeDtypeStruct(shp, jnp.float32),
                   jax.ShapeDtypeStruct(shp, jnp.float32)),
        input_output_aliases={8: 0, 9: 1},
        scratch_shapes=_fwd_scratch(cdim, fdim, bf, signs3),
        interpret=interp,
        **_hop_vmem(),
    )(udm, txp, txc, txb, jnp.asarray(tbl_a), jnp.asarray(tbl_b), h0th3,
      signs3, psi0.re.reshape(shp).astype(jnp.float32),
      psi0.im.reshape(shp).astype(jnp.float32))
    d = 2**n_qubits
    return CP(out_re.reshape(bsz, d), out_im.reshape(bsz, d))


def _fwd_hop_b(psi0, ud, theta_x, h0th, signs, x_entries, n_qubits,
               kinds=None, fast_math=False):
    out = _forward_hop_b(psi0, ud, theta_x, h0th, signs, x_entries,
                         n_qubits, kinds, fast_math)
    return out, (out, ud, theta_x, h0th, signs)


def _bwd_hop_b(x_entries, n_qubits, kinds, fast_math, residuals, lam):
    psi_T, ud, theta_x, h0th, signs = residuals
    (c, f, cdim, fdim, bf, tbl_a, ka, tbl_b, kb, b_commute, n_steps,
     n_diag, interp, udm, txp, txc, txb, h0th3, signs3, flags_a,
     flags_b) = _setup_hop(
        ud, theta_x, h0th, signs, x_entries, n_qubits, kinds, fast_math)
    bsz = ud.shape[1]
    kernel = _make_mega_hop_bwd(ka, kb, n_diag, c, f, bf, fast_math,
                                n_steps, b_commute, flags_a, flags_b,
                                batched=True)
    row, ta, tb = _hop_specs(tbl_a, tbl_b, n_steps, bsz=bsz, rev=True)
    grow = pl.BlockSpec((1, 1, _LANES),
                        lambda b, i: ((n_steps - i) * bsz + b, 0, 0),
                        memory_space=pltpu.VMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    shp = (bsz, cdim, fdim, _LANES)
    st = jax.ShapeDtypeStruct(shp, jnp.float32)
    gr = jax.ShapeDtypeStruct(((n_steps + 1) * bsz, 1, _LANES), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(bsz, n_steps + 1),
        in_specs=[row, row, row, row, ta, tb,
                  anyspec, anyspec, anyspec, anyspec, anyspec, anyspec],
        out_specs=(anyspec, anyspec, anyspec, anyspec, grow, grow, grow,
                   grow),
        out_shape=(st, st, st, st, gr, gr, gr, gr),
        input_output_aliases={8: 0, 9: 1, 10: 2, 11: 3},
        scratch_shapes=_bwd_scratch(cdim, fdim, bf, signs3),
        interpret=interp,
        **_hop_vmem(),
    )(udm, txp, txc, txb, jnp.asarray(tbl_a), jnp.asarray(tbl_b), h0th3,
      signs3, psi_T.re.reshape(shp).astype(jnp.float32),
      psi_T.im.reshape(shp).astype(jnp.float32),
      lam.re.reshape(shp).astype(jnp.float32),
      lam.im.reshape(shp).astype(jnp.float32))
    # t-major flattened rows back to [T+1, B, 128]
    unflat = lambda v: v[:, 0].reshape(n_steps + 1, bsz, _LANES)  # noqa
    gud, gtx = _assemble_grads(unflat(outs[4]), unflat(outs[5]),
                               unflat(outs[6]), unflat(outs[7]),
                               n_steps, b_commute)
    d = 2**n_qubits
    return (CP(outs[2].reshape(bsz, d), outs[3].reshape(bsz, d)),
            gud[..., :ud.shape[-1]].astype(ud.dtype),
            gtx[..., :theta_x.shape[-1]].astype(theta_x.dtype),
            jnp.zeros_like(h0th),
            np.zeros(signs.shape, dtype=jax.dtypes.float0))


chunked_evolve_mega_hop_batched.defvjp(_fwd_hop_b, _bwd_hop_b)


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
