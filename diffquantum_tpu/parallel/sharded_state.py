"""State-vector sharding over a device mesh (shard_map + collectives).

The reference is single-process/single-thread (SURVEY.md §2 "Parallelism
inventory: none"); this module is the TPU-native scale-out for state vectors
too large for one chip's HBM (20+ qubits) or for cutting latency at 16-18.

Layout: a mesh axis ``state`` of size 2^k shards the 2^n amplitude vector
into contiguous blocks — equivalently, the first k qubits (MSBs in the kron
ordering) become *distributed* qubits, device coordinate m holding the
amplitudes whose leading bits equal binary(m). Under ``shard_map``:

- **diagonal terms** (ZZ couplers, Z drives, any Ising cost): the phase
  vector is sharded identically — purely local elementwise work, zero
  communication;
- **single-qubit rotations on local qubits** (q >= k): a 2x2 contraction on
  a local tensor axis — no communication;
- **single-qubit rotations on distributed qubits** (q < k): the pair partner
  lives on device ``m XOR 2^(k-1-q)`` — one ``lax.ppermute`` exchanges
  blocks, then the rotation is a local linear combination. For involutory
  generators: X: psi' = cos(th) psi - i sin(th) psi_partner; Y: psi' =
  cos(th) psi + sign(bit) sin(th) psi_partner (real mix);
- **measurement** of a diagonal observable: local partial sum + ``psum``.

Communication cost per step: one ppermute of the local block per
distributed-qubit rotation — bandwidth-optimal for this gate set, riding ICI
neighbor links.

Everything is differentiable (shard_map supports reverse-mode), so adjoint
training works on the sharded path.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..dynamics.hamiltonian import ControlledHamiltonian
from ..dynamics.product import split_structure
from ..ops import cpx
from ..ops.fused_product import (diag_rows_device,
                                 diag_vec_device)
from ..ops.cpx import CP


def _phase_cp(theta: jnp.ndarray) -> CP:
    return CP(jnp.cos(theta), -jnp.sin(theta))


def _bcast_theta(theta, extra_dims: int):
    """Right-pad theta (scalar or [batch]) with singleton dims so it
    broadcasts against [batch, ...block dims...]."""
    theta = jnp.asarray(theta)
    if theta.ndim == 0:
        return theta
    return theta.reshape(theta.shape + (1,) * extra_dims)


def _local_1q_rot(psi: CP, theta, qubit_local: int, n_local: int,
                  local_re, local_im) -> CP:
    """Rotation exp(-i theta G) on a LOCAL tensor axis of the block.

    psi: CP [..., d_local]; qubit_local indexes within the local n_local
    qubits (0 = most significant local qubit). ``theta`` may be a scalar or
    a per-batch vector matching psi's leading axis."""
    lead = psi.re.shape[:-1]
    left = 2**qubit_local
    right = 2 ** (n_local - qubit_local - 1)
    shape = lead + (left, 2, right)
    pre, pim = psi.re.reshape(shape), psi.im.reshape(shape)
    gre = jnp.einsum("ab,...lbr->...lar", local_re, pre, precision=jax.lax.Precision.HIGHEST) \
        - jnp.einsum("ab,...lbr->...lar", local_im, pim, precision=jax.lax.Precision.HIGHEST)
    gim = jnp.einsum("ab,...lbr->...lar", local_re, pim, precision=jax.lax.Precision.HIGHEST) \
        + jnp.einsum("ab,...lbr->...lar", local_im, pre, precision=jax.lax.Precision.HIGHEST)
    th = _bcast_theta(theta, 3)
    c, s = jnp.cos(th), jnp.sin(th)
    out_re = c * pre + s * gim
    out_im = c * pim - s * gre
    flat = lead + (left * 2 * right,)
    return CP(out_re.reshape(flat), out_im.reshape(flat))


def _distributed_1q_rot(psi: CP, theta, kind: str, bit: jnp.ndarray,
                        mask: int, axis_name: str, axis_size: int) -> CP:
    """Rotation on a distributed qubit via one ppermute block exchange.

    kind: 'x' or 'y' (Pauli generators; Z on a distributed qubit is diagonal
    and never reaches here). ``bit`` is this device's value of the qubit;
    ``mask`` the XOR partner distance on the state axis.
    """
    perm = [(i, i ^ mask) for i in range(axis_size)]
    pp_re = jax.lax.ppermute(psi.re, axis_name, perm)
    pp_im = jax.lax.ppermute(psi.im, axis_name, perm)
    th = _bcast_theta(theta, psi.re.ndim - jnp.asarray(theta).ndim)
    c, s = jnp.cos(th), jnp.sin(th)
    if kind == "x":
        # psi' = c psi - i s psi_partner
        return CP(c * psi.re + s * pp_im, c * psi.im - s * pp_re)
    if kind == "y":
        # (Y psi)_local = i (2 bit - 1) psi_partner → real mix
        sgn = 2.0 * bit - 1.0
        return CP(c * psi.re + s * sgn * pp_re,
                  c * psi.im + s * sgn * pp_im)
    raise ValueError(f"unsupported distributed generator {kind!r}")


def _flip_local_bit(x: jnp.ndarray, qubit_local: int, n_local: int
                    ) -> jnp.ndarray:
    """Flip one local-qubit bit of the block's last axis (XOR gather as a
    reshape + axis flip — XLA, not a kernel)."""
    lead = x.shape[:-1]
    left = 2**qubit_local
    right = 2 ** (n_local - qubit_local - 1)
    y = x.reshape(lead + (left, 2, right))
    y = jnp.flip(y, axis=len(lead) + 1)
    return y.reshape(lead + (left * 2 * right,))


def _distributed_hop_rot(psi: CP, theta, qi: int, qj: int, k: int,
                         n_local: int, me, axis_name: str,
                         axis_size: int) -> CP:
    """exp(-i theta (XX + YY)) on a pair with >= 1 DISTRIBUTED qubit: one
    ppermute fetches the partner block (XOR over the distributed bits),
    local member bits flip locally, and the {01, 10} mask combines this
    device's distributed-bit values with a local iota bit. Rotates the
    masked subspace by 2*theta (same convention as
    :func:`..dynamics.product.apply_hop_rot`)."""
    dist = [q for q in (qi, qj) if q < k]
    loc = [q for q in (qi, qj) if q >= k]
    mask = 0
    for q in dist:
        mask |= 1 << (k - 1 - q)
    perm = [(i, i ^ mask) for i in range(axis_size)]
    pp_re = jax.lax.ppermute(psi.re, axis_name, perm)
    pp_im = jax.lax.ppermute(psi.im, axis_name, perm)
    for q in loc:
        pp_re = _flip_local_bit(pp_re, q - k, n_local)
        pp_im = _flip_local_bit(pp_im, q - k, n_local)
    # {01, 10} indicator: XOR of the pair's two bits of the GLOBAL index
    d_local = psi.re.shape[-1]
    jloc = jnp.arange(d_local, dtype=jnp.int32)
    bits = []
    for q in (qi, qj):
        if q < k:
            bits.append(jnp.broadcast_to((me >> (k - 1 - q)) & 1,
                                         (d_local,)))
        else:
            bits.append((jloc >> (n_local - 1 - (q - k))) & 1)
    m = jnp.bitwise_xor(bits[0], bits[1]).astype(psi.re.dtype)
    th = _bcast_theta(theta, psi.re.ndim - jnp.asarray(theta).ndim)
    c = jnp.cos(2.0 * th)
    s = jnp.sin(2.0 * th)
    ct = 1.0 + m * (c - 1.0)
    return CP(ct * psi.re + s * (m * pp_im),
              ct * psi.im - s * (m * pp_re))


def _classify_local(g: np.ndarray) -> str:
    if np.allclose(g, np.array([[0, 1], [1, 0]])):
        return "x"
    if np.allclose(g, np.array([[0, -1j], [1j, 0]])):
        return "y"
    return "dense"


def evolve_product_sharded(
    ham: ControlledHamiltonian,
    envelope,
    coeff: jnp.ndarray,
    psi0: CP,
    T0,
    T,
    horizon: float,
    n_steps: int,
    mesh: Mesh,
    state_axis: str = "state",
    batch_axis: Optional[str] = None,
    local_backend: str = "xla",
) -> CP:
    """Strang-split evolution with the amplitude axis sharded over
    ``state_axis`` of ``mesh`` (and an optional leading batch axis sharded
    over ``batch_axis``). Same math/grid as
    :func:`..dynamics.product.evolve_product`.

    ``local_backend`` selects how each step's LOCAL-qubit rotation block
    runs inside the shard_map body:

    - ``'xla'``: the per-rotation einsum chain (works everywhere, any dtype);
    - ``'fused'``: ONE Pallas kernel call per step
      (:func:`..ops.fused_product.fused_rot_block`) — diagonal phases and
      distributed-qubit mixes stay in XLA (elementwise + one ppermute per
      distributed rotation). Requires f32, Pauli X/Y locals, and >= 10 local
      qubits (sublane-aligned [2^(n_loc-7), 128] block). Hop (XX+YY) pairs
      are carried too (round 5): shard-local pairs ride the kernel's
      ordered op plan, boundary-straddling pairs the ppermute exchange —
      and because a straddling hop's local member can share a qubit with
      kernel ops, the distributed ops then wrap the kernel palindromically
      at half angles (symmetric, still a second-order integrator; the
      finite-dt trajectory differs from 'xla' ordering by O(dt^2));
    - ``'chunked'``: each shard runs the step through the chunked HBM-state
      engine (:func:`..ops.fused_chunked.chunked_evolve`, one Strang step
      per call) — lifts the per-shard ceiling from the fused block's
      VMEM-resident ~18 local qubits to the chunked engine's 22, i.e.
      22 + log2(n_devices) total qubits on a mesh (~27 on a 32-chip v5e
      slice). Additionally requires the packed-phase form (every diagonal
      control row two-valued) and an unbatched state. Distributed-qubit
      rotations wrap the local step palindromically at half angles, which
      keeps the composition symmetric (still a second-order integrator) but
      makes the trajectory differ from the 'xla'/'fused' ordering by
      O(dt^2);
    - ``'auto'``: fused when eligible on TPU, else xla.
    """
    from ..dynamics.product import split_structure_ext
    n = ham.n_qubits
    (diag_idx, diag_rows, h0_diag, oneq_idx, oneq_qubits,
     oneq_locals, hop_idx, hop_pairs) = split_structure_ext(ham)
    if hop_pairs and local_backend == "chunked":
        raise ValueError(
            "local_backend='chunked' does not support 'hop' terms; use "
            "'fused' (local pairs ride the kernel op plan, distributed "
            "pairs one ppermute each) or 'xla'")

    axis_size = mesh.shape[state_axis]
    k = int(round(np.log2(axis_size)))
    assert 2**k == axis_size, "state axis size must be a power of two"
    n_local = n - k

    if local_backend == "chunked":
        return _evolve_sharded_chunked(
            ham, envelope, coeff, psi0, T0, T, horizon, n_steps, mesh,
            state_axis, batch_axis, k, n_local,
            (diag_idx, diag_rows, h0_diag, oneq_idx, oneq_qubits,
             oneq_locals))

    dt = (T - T0) / n_steps
    ts = T0 + dt * jnp.arange(n_steps, dtype=jnp.result_type(float))
    # per-seed coefficients: one extra leading dim on coeff → per-seed
    # amplitude tables (true data-parallel training over the batch axis).
    per_seed = coeff.ndim == len(envelope.coeff_shape) + 1
    if per_seed:
        if not batch_axis:
            raise ValueError("per-seed coeff needs a batch_axis")
        u = jax.vmap(lambda c: envelope.amplitudes(c, ts, horizon))(coeff)
        # u: [S, n_controls, n_steps]
    else:
        u = envelope.amplitudes(coeff, ts, horizon)  # [n_controls, n_steps]
    rdt = ham.dtype

    diag_table = diag_rows_device(diag_rows, ham.dim, rdt)
    h0_vec = diag_vec_device(h0_diag, rdt)
    ctrl_axis = -2
    di = jnp.asarray(diag_idx, dtype=jnp.int32)
    qi = jnp.asarray(oneq_idx, dtype=jnp.int32)
    hi = jnp.asarray(hop_idx, dtype=jnp.int32)
    u_diag = jnp.take(u, di, axis=ctrl_axis) if diag_idx else \
        jnp.zeros(u.shape[:-2] + (0, n_steps), dtype=u.dtype)
    u_oneq = jnp.take(u, qi, axis=ctrl_axis) if oneq_idx else \
        jnp.zeros(u.shape[:-2] + (0, n_steps), dtype=u.dtype)
    u_hop = jnp.take(u, hi, axis=ctrl_axis) if hop_idx else \
        jnp.zeros(u.shape[:-2] + (0, n_steps), dtype=u.dtype)
    # scan xs layout: [n_steps, (S,) n_k]
    u_diag = jnp.moveaxis(u_diag, -1, 0).astype(rdt)
    u_oneq = jnp.moveaxis(u_oneq, -1, 0).astype(rdt)
    u_hop = jnp.moveaxis(u_hop, -1, 0).astype(rdt)
    dt = jnp.asarray(dt, dtype=rdt)
    locals_np = [np.asarray(g) for g in oneq_locals]
    kinds = [_classify_local(g) for g in locals_np]
    locals_re = [jnp.asarray(g.real, dtype=rdt) for g in locals_np]
    locals_im = [jnp.asarray(g.imag, dtype=rdt) for g in locals_np]

    batched = psi0.ndim > 1
    state_spec = (P(batch_axis, state_axis) if batched
                  else P(state_axis))
    diag_spec = P(state_axis)
    u_spec = P(None, batch_axis, None) if per_seed else P()

    # same-qubit non-commuting drives (X+Y two-quadrature, or a hop
    # overlapping a 1q drive) need palindromic sub-step ordering to keep
    # the Strang split second-order — see
    # ..dynamics.product._symmetrize_rots
    used_qubits = list(oneq_qubits) + [q for pr in hop_pairs for q in pr]
    palindromic = len(set(used_qubits)) < len(used_qubits)

    # static local/distributed partition (distinct-qubit rotations commute,
    # so grouping locals before distributed ones preserves the product; a
    # duplicated qubit is always entirely in one group — EXCEPT once hops
    # straddle the shard boundary, handled by the palindromic wrap below)
    m_rots = len(oneq_qubits)
    loc_ids = [i for i in range(m_rots) if oneq_qubits[i] >= k]
    dist_ids = [i for i in range(m_rots) if oneq_qubits[i] < k]
    loc_hops = [h for h, (a, b) in enumerate(hop_pairs)
                if a >= k and b >= k]
    dist_hops = [h for h in range(len(hop_pairs)) if h not in loc_hops]
    d_local = ham.dim // axis_size
    fused_ok = (rdt == jnp.float32 and n_local >= 10
                and d_local % 128 == 0 and (d_local // 128) % 8 == 0
                and all(kinds[i] in ("x", "y") for i in loc_ids))
    if local_backend == "auto":
        local_backend = "fused" if (fused_ok and jax.default_backend()
                                    in ("tpu", "axon")) else "xla"
    if local_backend == "fused" and not fused_ok:
        raise ValueError(
            "local_backend='fused' needs f32, Pauli X/Y local terms and "
            ">= 10 local qubits (sublane-aligned block)")
    if local_backend == "fused":
        # local op plan: 1q rotations then local hop pairs, palindromized
        # when any local qubit repeats (same rule as _symmetrize_rots) —
        # hops ride the streamed kernels' ordered op plan (VERDICT r4 #5:
        # round 4 forced every hop-carrying drive set onto 'xla')
        loc_entries = [oneq_qubits[i] - k for i in loc_ids] + \
            [(hop_pairs[h][0] - k, hop_pairs[h][1] - k) for h in loc_hops]
        loc_kinds = [kinds[i] for i in loc_ids] + ["hop"] * len(loc_hops)
        used_loc = []
        for e in loc_entries:
            used_loc.extend(e) if isinstance(e, tuple) else \
                used_loc.append(e)
        loc_dup = len(set(used_loc)) < len(used_loc)
        if loc_dup:
            kernel_qubits = tuple(loc_entries) + \
                tuple(reversed(loc_entries))
            kernel_kinds = tuple(loc_kinds) + tuple(reversed(loc_kinds))
        else:
            kernel_qubits, kernel_kinds = tuple(loc_entries), \
                tuple(loc_kinds)
        if len(kernel_qubits) > 128:
            raise ValueError(
                "local fused op plan exceeds the 128 angle lanes; use "
                "local_backend='xla'")
        loc_idx_arr = jnp.asarray(loc_ids, dtype=jnp.int32)
        loc_hop_arr = jnp.asarray(loc_hops, dtype=jnp.int32)
        dist_dup = len({oneq_qubits[i] for i in dist_ids}) < len(dist_ids)
        # a distributed hop's LOCAL member can share a qubit with a local
        # op, so locals and distributed ops no longer commute: wrap the
        # local kernel palindromically — D(1/2) · L · D(1/2, reversed) —
        # a symmetric composition of exact factors (2nd order)
        wrap_dist = bool(hop_pairs)

    def inner(psi_re, psi_im, dtab, h0v, ud_t, uq_t, uh_t):
        psi = CP(psi_re, psi_im)
        me = jax.lax.axis_index(state_axis)

        def apply_rot(p, i, th):
            q = oneq_qubits[i]
            if q >= k:
                return _local_1q_rot(p, th, q - k, n_local,
                                     locals_re[i], locals_im[i])
            mask = 1 << (k - 1 - q)
            bit = ((me >> (k - 1 - q)) & 1).astype(p.re.dtype)
            return _distributed_1q_rot(p, th, kinds[i], bit, mask,
                                       state_axis, axis_size)

        def apply_hop(p, hidx, th):
            qi_, qj_ = hop_pairs[hidx]
            if qi_ >= k and qj_ >= k:
                from ..dynamics.product import apply_hop_rot
                return apply_hop_rot(p, _bcast_theta(th, 0), qi_ - k,
                                     qj_ - k, n_local)
            return _distributed_hop_rot(p, th, qi_, qj_, k, n_local, me,
                                        state_axis, axis_size)

        def step_xla(p, xs):
            ud, uq, uh = xs  # [(S,) n_diag], [(S,) n_oneq], [(S,) n_hop]
            # local diagonal phase: [(S,) d_local]
            theta_half = (0.5 * dt) * (h0v + jnp.matmul(ud, dtab, precision=jax.lax.Precision.HIGHEST))
            ph = _phase_cp(theta_half)
            p = cpx.mul(CP(jnp.broadcast_to(ph.re, p.re.shape),
                           jnp.broadcast_to(ph.im, p.im.shape)), p)
            rot_ops = [("1q", i) for i in range(m_rots)] \
                + [("hop", h) for h in range(len(hop_pairs))]
            order = rot_ops + rot_ops[::-1] if palindromic else rot_ops
            frac = 0.5 * dt if palindromic else dt
            for kind_op, i in order:
                if kind_op == "1q":
                    p = apply_rot(p, i, frac * uq[..., i])
                else:
                    p = apply_hop(p, i, frac * uh[..., i])
            p = cpx.mul(CP(jnp.broadcast_to(ph.re, p.re.shape),
                           jnp.broadcast_to(ph.im, p.im.shape)), p)
            return p, None

        def step_fused(p, xs):
            from ..ops.fused_product import fused_rot_block
            ud, uq, uh = xs
            theta_half = (0.5 * dt) * (h0v + jnp.matmul(
                ud, dtab, precision=jax.lax.Precision.HIGHEST))
            ph = _phase_cp(theta_half)
            p = cpx.mul(CP(jnp.broadcast_to(ph.re, p.re.shape),
                           jnp.broadcast_to(ph.im, p.im.shape)), p)

            def local_block(p):
                if not (loc_ids or loc_hops):
                    return p
                th = dt * jnp.take(uq, loc_idx_arr, axis=-1)
                if loc_hops:  # kernel hop angle = 2 x (dt x u) — the
                    # {01,10} subspace rotates by twice the hop angle
                    th = jnp.concatenate(
                        [th, 2.0 * dt * jnp.take(uh, loc_hop_arr,
                                                 axis=-1)], axis=-1)
                if loc_dup:
                    th = 0.5 * jnp.concatenate(
                        [th, jnp.flip(th, axis=-1)], axis=-1)
                if p.ndim > 1 and th.ndim == 1:  # shared pulse, seeds
                    th = jnp.broadcast_to(th, p.shape[:1] + th.shape)
                return fused_rot_block(p, th, kernel_qubits, n_local,
                                       kernel_kinds)

            dist_ops = [("1q", i) for i in dist_ids] \
                + [("hop", h) for h in dist_hops]

            def dist_block(p, frac, rev):
                for kind_op, i in (reversed(dist_ops) if rev
                                   else dist_ops):
                    if kind_op == "1q":
                        p = apply_rot(p, i, frac * uq[..., i])
                    else:
                        p = apply_hop(p, i, frac * uh[..., i])
                return p

            if wrap_dist:
                # D(1/2) · L · D(1/2, reversed): distributed ops may share
                # qubits with local ops (boundary-straddling hops)
                p = dist_block(p, 0.5 * dt, rev=False)
                p = local_block(p)
                p = dist_block(p, 0.5 * dt, rev=True)
            else:
                p = local_block(p)
                if dist_dup:
                    p = dist_block(p, 0.5 * dt, rev=False)
                    p = dist_block(p, 0.5 * dt, rev=True)
                else:
                    p = dist_block(p, dt, rev=False)
            p = cpx.mul(CP(jnp.broadcast_to(ph.re, p.re.shape),
                           jnp.broadcast_to(ph.im, p.im.shape)), p)
            return p, None

        step = step_fused if local_backend == "fused" else step_xla

        out, _ = jax.lax.scan(step, psi, (ud_t, uq_t, uh_t))
        return out.re, out.im

    for i, kind in enumerate(kinds):
        if kind == "dense" and oneq_qubits[i] < k:
            raise ValueError("distributed 1q terms must be Pauli X or Y")

    shmap = shard_map(
        inner, mesh=mesh,
        in_specs=(state_spec, state_spec, P(None, state_axis), diag_spec,
                  u_spec, u_spec, u_spec),
        out_specs=(state_spec, state_spec),
        # pallas_call outputs carry no varying-mesh-axes metadata; the fused
        # local blocks are strictly per-shard, so the check is vacuous here
        check_vma=False,
    )
    re, im = shmap(psi0.re.astype(rdt), psi0.im.astype(rdt), diag_table,
                   h0_vec, u_diag, u_oneq, u_hop)
    return CP(re, im)


def _evolve_sharded_chunked(ham, envelope, coeff, psi0, T0, T, horizon,
                            n_steps, mesh, state_axis, batch_axis, k,
                            n_local, structure) -> CP:
    """State-sharded evolution whose per-shard local block is the chunked
    HBM-state engine (one :func:`..ops.fused_chunked.chunked_evolve` Strang
    step per time step) — the >18-local-qubit scale-out path.

    Composition per step: ``D(dt/2) · [Phi/2 R_local Phi/2] · D(dt/2)``
    where ``D`` applies the distributed-qubit rotations at half angles
    (closing wrap in reversed order). The bracket is the chunked engine's
    symmetric step and ``D . D_rev`` closes the palindrome, so the full
    step is a symmetric (second-order) integrator; it differs from the
    'xla'/'fused' ordering (distributed rotations INSIDE the half-phases)
    by O(dt^2) — both converge to the same dynamics.
    """
    from ..dynamics.product import _pauli_kind, _symmetrize_rots
    from ..ops.fused_chunked import _plan, chunked_evolve
    from ..ops.fused_product import pack_diag_signs

    (diag_idx, diag_rows, h0_diag, oneq_idx, oneq_qubits,
     oneq_locals) = structure
    rdt = ham.dtype
    if rdt != jnp.float32:
        raise ValueError("local_backend='chunked' needs an f32 Hamiltonian")
    if psi0.ndim != 1 or coeff.ndim != len(envelope.coeff_shape):
        raise ValueError("local_backend='chunked' supports a single "
                         "unbatched state and shared coefficients")
    if n_local < 10:
        raise ValueError("local_backend='chunked' needs >= 10 local qubits")
    _plan(n_local)  # raises past the chunked engine's 24-local-qubit cap
    kinds_all = [_pauli_kind(g) for g in oneq_locals]
    if any(kd is None for kd in kinds_all):
        raise ValueError("local_backend='chunked' needs Pauli X/Y 1q terms")

    d = ham.dim
    if diag_rows:
        from ..ops.fused_product import (parity_sign_masks,
                                         signs_planes_device)
        par = parity_sign_masks(diag_rows)
        if par is not None:  # constant-free planes (see packed_tables)
            masks, consts, scales = par
            signs_dev = signs_planes_device(masks, d)
        else:
            packed = pack_diag_signs(diag_rows)
            if packed is None:
                raise ValueError(
                    "local_backend='chunked' needs the packed-phase form: "
                    "every diagonal control row two-valued (Pauli-Z "
                    "strings), <= 120 terms")
            signs_np, consts, scales = packed
            signs_dev = jnp.asarray(signs_np)
    else:
        signs_dev = jnp.zeros((1, d), jnp.int32)
        consts = np.zeros(0)
        scales = np.zeros(0)

    axis_size = 2**k
    dt = (T - T0) / n_steps
    ts = T0 + dt * jnp.arange(n_steps, dtype=jnp.result_type(float))
    u = envelope.amplitudes(coeff, ts, horizon)  # [n_controls, n_steps]
    half = jnp.asarray(0.5 * dt, rdt)
    u_diag = (jnp.take(u, jnp.asarray(diag_idx, jnp.int32), axis=0)
              if diag_idx else jnp.zeros((0, n_steps))).astype(rdt)
    u_oneq = (jnp.take(u, jnp.asarray(oneq_idx, jnp.int32), axis=0)
              if oneq_idx else jnp.zeros((0, n_steps))).astype(rdt)
    ud_core = half * u_diag.T * jnp.asarray(scales, rdt)
    off = half * jnp.einsum("tk,k->t", u_diag.T, jnp.asarray(consts, rdt))
    ud_full = jnp.concatenate([ud_core, off[:, None]], axis=1)  # [T, nd+1]

    m = len(oneq_qubits)
    loc_ids = [i for i in range(m) if oneq_qubits[i] >= k]
    dist_ids = [i for i in range(m) if oneq_qubits[i] < k]
    theta_loc = jnp.asarray(dt, rdt) * u_oneq.T[:, jnp.asarray(
        loc_ids, jnp.int32)] if loc_ids else jnp.zeros((n_steps, 0), rdt)
    loc_qubits_t, loc_kinds_t, theta_loc = _symmetrize_rots(
        [oneq_qubits[i] - k for i in loc_ids],
        [kinds_all[i] for i in loc_ids], theta_loc, axis=1)
    theta_dist = half * u_oneq.T[:, jnp.asarray(dist_ids, jnp.int32)] \
        if dist_ids else jnp.zeros((n_steps, 0), rdt)
    h0th = half * diag_vec_device(h0_diag, rdt)
    signs = signs_dev

    def inner(p_re, p_im, h0v, sg, ud_t, tl_t, td_t):
        me = jax.lax.axis_index(state_axis)

        def dist_rot(p, i, th):
            q = oneq_qubits[i]
            mask = 1 << (k - 1 - q)
            bit = ((me >> (k - 1 - q)) & 1).astype(p.re.dtype)
            return _distributed_1q_rot(p, th, kinds_all[i], bit, mask,
                                       state_axis, axis_size)

        def step(p, xs):
            ud_row, tl_row, td_row = xs
            for di, i in enumerate(dist_ids):
                p = dist_rot(p, i, td_row[di])
            p = chunked_evolve(p, ud_row[None], tl_row[None], h0v, sg,
                               loc_qubits_t, n_local, loc_kinds_t, False)
            for di, i in reversed(list(enumerate(dist_ids))):
                p = dist_rot(p, i, td_row[di])
            return p, None

        out, _ = jax.lax.scan(step, CP(p_re, p_im), (ud_t, tl_t, td_t))
        return out.re, out.im

    shmap = shard_map(
        inner, mesh=mesh,
        in_specs=(P(state_axis), P(state_axis), P(state_axis),
                  P(None, state_axis), P(), P(), P()),
        out_specs=(P(state_axis), P(state_axis)),
        check_vma=False,  # pallas outputs carry no varying-mesh-axes info
    )
    re, im = shmap(psi0.re.astype(rdt), psi0.im.astype(rdt), h0th, signs,
                   ud_full, theta_loc, theta_dist)
    return CP(re, im)


def sharded_diag_expectation(psi: CP, diag: jnp.ndarray, mesh: Mesh,
                             state_axis: str = "state",
                             batch_axis: Optional[str] = None) -> jnp.ndarray:
    """<psi|diag(M)|psi> with the amplitude axis sharded: local partial sums
    + one psum over the state axis."""
    batched = psi.ndim > 1
    state_spec = P(batch_axis, state_axis) if batched else P(state_axis)
    out_spec = P(batch_axis) if batched else P()

    def inner(p_re, p_im, dvec):
        local = jnp.sum((p_re * p_re + p_im * p_im) * dvec, axis=-1)
        return jax.lax.psum(local, state_axis)

    return shard_map(inner, mesh=mesh,
                     in_specs=(state_spec, state_spec, P(state_axis)),
                     out_specs=out_spec)(psi.re, psi.im, diag)


def sharded_strings_expectation(psi: CP, strings, mesh: Mesh,
                                state_axis: str = "state",
                                batch_axis: Optional[str] = None
                                ) -> jnp.ndarray:
    """``<psi|M|psi>`` for a matrix-free Pauli-sum observable
    (:class:`...measure.PauliStringSet`) with the amplitude axis SHARDED:
    each term's XOR-index flip splits into a distributed part (top k bits
    — one ``lax.ppermute`` block exchange riding ICI) and a local part
    (an in-shard gather); the parity sign likewise splits into the
    device-coordinate parity and a local-iota parity. One psum of the
    accumulated real total at the end. This closes the SPMD measurement
    gap for non-diagonal costs (TFIM/Heisenberg/molecules) —
    :func:`sharded_diag_expectation` covers only diagonal observables."""
    axis_size = mesh.shape[state_axis]
    k = int(round(np.log2(axis_size)))
    assert 2**k == axis_size, "state axis size must be a power of two"
    n = strings.n_qubits
    n_local = n - k
    d_local = 2**n_local
    batched = psi.ndim > 1
    state_spec = P(batch_axis, state_axis) if batched else P(state_axis)
    out_spec = P(batch_axis) if batched else P()

    def _parity(x):
        # popcount parity of a non-negative int32 array (shift amounts as
        # int32 constants — a python int promotes to int64 under x64)
        for sh in (16, 8, 4, 2, 1):
            x = jnp.bitwise_xor(
                x, jax.lax.shift_right_logical(x, jnp.int32(sh)))
        return jnp.bitwise_and(x, jnp.int32(1))

    def inner(p_re, p_im, weights):
        me = jax.lax.axis_index(state_axis)
        j = jnp.arange(d_local, dtype=jnp.int32)
        total = jnp.zeros(p_re.shape[:-1], p_re.dtype)
        for t in range(strings.n_terms):
            flip, yz = strings.flips[t], strings.yz_masks[t]
            flip_dist = flip >> n_local
            flip_loc = flip & (d_local - 1)
            yz_dist = yz >> n_local
            yz_loc = yz & (d_local - 1)
            if flip_dist:
                perm = [(i, i ^ flip_dist) for i in range(axis_size)]
                qr = jax.lax.ppermute(p_re, state_axis, perm)
                qi = jax.lax.ppermute(p_im, state_axis, perm)
            else:
                qr, qi = p_re, p_im
            jp = j ^ jnp.int32(flip_loc)
            # sign parity of the PARTNER's global index & yz mask
            par = (_parity(jp & jnp.int32(yz_loc))
                   + _parity((me ^ flip_dist) & yz_dist)) % 2
            s = (1.0 - 2.0 * par).astype(p_re.dtype)
            pre = jnp.take(qr, jp, axis=-1) * s
            pim = jnp.take(qi, jp, axis=-1) * s
            g_re = jnp.sum(p_re * pre + p_im * pim, axis=-1)
            g_im = jnp.sum(p_re * pim - p_im * pre, axis=-1)
            e = (g_re, -g_im, -g_re, g_im)[strings.n_ys[t] % 4]
            total = total + weights[t] * e
        return jax.lax.psum(total, state_axis)

    return shard_map(inner, mesh=mesh,
                     in_specs=(state_spec, state_spec, P()),
                     out_specs=out_spec)(psi.re, psi.im, strings.weights)
