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
from ..ops.fused_product import (diag_rows_device,
                                 diag_vec_device)
from ..ops.cpx import CP
from .hamiltonian import ControlledHamiltonian, TermStructure

_HP = jax.lax.Precision.HIGHEST  # TPU matmul default is bf16 — never ok here


def split_structure(ham: ControlledHamiltonian, hop_msg: str = None):
    """Partition control terms into (diag_indices, diag_table) and
    (oneq_indices, qubits, locals). Raises if any term is unstructured or a
    'hop' pair (engines that support hops use
    :func:`split_structure_ext`). ``hop_msg`` lets a caller that cannot
    support hops explain its own limitation instead of the generic hint."""
    out = split_structure_ext(ham)
    if out[6]:
        raise ValueError(hop_msg or (
            "this engine does not support 'hop' (XX+YY) terms; use the "
            "product backend (evolve_product)"))
    return out[:6]


# Host-side structure analysis is a real cost at the frontier: each
# diagonal row scan is O(2^n) numpy work (up to 120 rows at 2^24 = 16M
# amplitudes), and `fused_eligible` + `evolve_product_fused` used to
# repeat it per call (ADVICE r4). Results are memoized per Hamiltonian,
# keyed by the IDENTITY of its (immutable) structure tuples — the cache
# holds a strong reference to the keys, so ids cannot be reused while an
# entry lives. Bounded FIFO; entries are tiny (host metadata only).
_ANALYSIS_CACHE = {}
_ANALYSIS_CACHE_MAX = 64


def _analysis_slot(ham: ControlledHamiltonian) -> dict:
    """The per-Hamiltonian memo dict shared by select_engine /
    split_structure_ext / the packed-form probe."""
    key = (id(ham.structure), id(ham.h0_structure), ham.n_qubits)
    ent = _ANALYSIS_CACHE.get(key)
    if ent is not None and ent[0] is ham.structure \
            and ent[1] is ham.h0_structure:
        return ent[2]
    while len(_ANALYSIS_CACHE) >= _ANALYSIS_CACHE_MAX:
        _ANALYSIS_CACHE.pop(next(iter(_ANALYSIS_CACHE)))
    slot: dict = {}
    _ANALYSIS_CACHE[key] = (ham.structure, ham.h0_structure, slot)
    return slot


def split_structure_ext(ham: ControlledHamiltonian):
    """Like :func:`split_structure` plus the hopping terms:
    (..., hop_idx, hop_pairs) with hop_pairs a list of (i, j) site pairs
    for ``X_i X_j + Y_i Y_j`` generators. Memoized per Hamiltonian (the
    row extraction is O(n_terms * 2^n) host work)."""
    if ham.structure is None:
        raise ValueError("product backend needs TermStructure metadata")
    slot = _analysis_slot(ham)
    if "split" in slot:
        return slot["split"]
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
    out = (diag_idx, diag_rows, np.asarray(h0.diag, dtype=np.float64),
           oneq_idx, oneq_qubits, oneq_locals, hop_idx, hop_pairs)
    slot["split"] = out
    return out


def _packed_form(ham: ControlledHamiltonian):
    """Memoized `pack_diag_signs(diag_rows)` — the packed-phase probe both
    :func:`select_engine` and :func:`evolve_product_fused` need; each
    cold run scans every diagonal row (O(2^n) per row)."""
    slot = _analysis_slot(ham)
    if "packed" not in slot:
        from ..ops.fused_product import pack_diag_signs
        _, diag_rows, *_ = split_structure_ext(ham)
        slot["packed"] = pack_diag_signs(diag_rows)
    return slot["packed"]


def _phase(theta: jnp.ndarray) -> CP:
    """exp(-i theta) as CP (elementwise)."""
    return CP(jnp.cos(theta), -jnp.sin(theta))


def _lane_gmul(psi: CP, qubit: int, n_qubits: int, local_re, local_im):
    """(G psi) for a qubit in the LOW 7 bits, as one [rows, 128] x
    [128, 128] matmul: P = I_a (x) g (x) I_right over the lane tier.
    The [left, 2, right<128] reshape form puts tiny dims in the two
    minor positions, which XLA pads to full (8, 128) tiles — a
    chip-measured 64x memory expansion that OOMed the 23-24q backward
    (HLO temps at 4 GB per rotation). Returns (gre, gim, rows_shape)."""
    lead = psi.re.shape[:-1]
    right = 2 ** (n_qubits - qubit - 1)
    rows = 2 ** (n_qubits - 7)
    shape = lead + (rows, 128)
    a = 128 // (2 * right)
    ia = jnp.eye(a, dtype=local_re.dtype)
    ir = jnp.eye(right, dtype=local_re.dtype)
    p_re = jnp.kron(jnp.kron(ia, local_re), ir)
    p_im = jnp.kron(jnp.kron(ia, local_im), ir)
    pre, pim = psi.re.reshape(shape), psi.im.reshape(shape)
    mm = lambda x, p: jnp.einsum("...rc,dc->...rd", x, p,  # noqa: E731
                                 precision=_HP)
    gre = mm(pre, p_re) - mm(pim, p_im)
    gim = mm(pim, p_re) + mm(pre, p_im)
    return pre, pim, gre, gim


def apply_1q_pauli_rot(psi: CP, theta, qubit: int, n_qubits: int,
                       local_re: jnp.ndarray, local_im: jnp.ndarray) -> CP:
    """Apply exp(-i theta G) for an involutory 2x2 generator G (G^2 = I,
    e.g. any Pauli): exactly cos(theta) I - i sin(theta) G.

    psi: CP [..., 2^n]; the gate acts on tensor axis ``qubit`` (0 = MSB).
    """
    lead = psi.re.shape[:-1]
    left = 2**qubit
    right = 2 ** (n_qubits - qubit - 1)
    c, s = jnp.cos(theta), jnp.sin(theta)
    if right < 128 and n_qubits >= 10:
        pre, pim, gre, gim = _lane_gmul(psi, qubit, n_qubits,
                                        local_re, local_im)
        out_re = c * pre + s * gim
        out_im = c * pim - s * gre
        d = psi.re.shape[-1]
        return CP(out_re.reshape(lead + (d,)), out_im.reshape(lead + (d,)))
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
    if right < 128 and n_qubits >= 10:  # avoid tiny-minor-dim tile padding
        d = psi.re.shape[-1]
        _, _, gre, gim = _lane_gmul(psi, qubit, n_qubits,
                                    local_re, local_im)
        return CP(gre.reshape(lead + (d,)), gim.reshape(lead + (d,)))
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
    """Palindromic sub-step ordering when two drives share a qubit (the
    non-commuting X+Y two-quadrature case, or a hop overlapping a 1q
    drive): half angles forward, then half angles in reversed order —
    restores the Strang split's O(dt^2) global error. The fused kernel's
    internal row/lane partitioning only reorders rotations on DISTINCT
    qubits (which commute), so the palindrome of same-qubit pairs survives
    the partition (hop entries are applied strictly in sequence order —
    :func:`..ops.fused_product._plan_ops`). No-op for distinct qubits.

    ``qubits`` entries are ints (1q) or (i, j) pairs (kind 'hop') —
    mirrors the ``used`` flattening of :func:`_make_strang_step`."""
    used = []
    for ent in qubits:
        used.extend(ent) if isinstance(ent, tuple) else used.append(ent)
    if len(set(used)) == len(used):
        return tuple(qubits), tuple(kinds), theta_x
    half = 0.5 * theta_x
    rev = jnp.flip(half, axis=axis)
    return (tuple(qubits) + tuple(reversed(tuple(qubits))),
            tuple(kinds) + tuple(reversed(tuple(kinds))),
            jnp.concatenate([half, rev], axis=axis))


def _mega_hop_dispatch(psi_flat: CP, ud_full, th_x, h0th, signs_arr,
                       entries, kinds, n, fast, batched=False) -> CP:
    """Route a hop-carrying 19-24q evolution through the palindromic-
    schedule mega engine: relabel qubits to the feasible chunk/free/lane
    layout (:func:`..ops.fused_mega_hop.plan_chunked_hop_layout`),
    bit-transpose the state and sign planes in, evolve, transpose back.
    The transposes are XLA ops outside the custom VJP, so psi0's
    cotangent flows through them automatically. ``batched=True`` takes a
    seed population (psi [B, d], ud/th_x [T, B, ...]) through the
    (B, n_steps+1)-grid kernel — ONE compiled program for all seeds."""
    from ..ops.fused_mega_hop import (chunked_evolve_mega_hop,
                                      chunked_evolve_mega_hop_batched,
                                      invert_perm, permute_amplitude_bits,
                                      plan_chunked_hop_layout)
    perm = plan_chunked_hop_layout(entries, kinds, n)
    if perm is None:  # fused_eligible guards this; defensive only
        raise ValueError("no feasible chunk layout for this hop graph; "
                         "use backend='product'")
    pos_of = invert_perm(perm)
    entries_pos = tuple(
        (min(pos_of[e[0]], pos_of[e[1]]), max(pos_of[e[0]], pos_of[e[1]]))
        if isinstance(e, tuple) else pos_of[e] for e in entries)
    psip = CP(permute_amplitude_bits(psi_flat.re, perm),
              permute_amplitude_bits(psi_flat.im, perm))
    evolve = chunked_evolve_mega_hop_batched if batched else \
        chunked_evolve_mega_hop
    out = evolve(
        psip, ud_full, th_x,
        permute_amplitude_bits(h0th, perm),
        permute_amplitude_bits(signs_arr, perm),
        entries_pos, n, tuple(kinds), fast)
    return CP(permute_amplitude_bits(out.re, pos_of),
              permute_amplitude_bits(out.im, pos_of))


# Largest size the VMEM-resident packed kernels carry on chip: the 18q
# backward needs a 40 MiB scoped-vmem window (fine); the 19q one needs
# ~64+ MiB, which crashes the remote compile helper (measured). Past 18
# the chunked HBM-state engine takes over (validated at 21q on chip).
_VMEM_PACKED_MAX = 18

# Smallest size routed to the packed-phase kernels (tests lower this to
# exercise the packed machinery at cheap sizes).
_PACKED_MIN_QUBITS = 18


def select_engine(ham: ControlledHamiltonian) -> str:
    """The load-bearing routing table, one name per regime (VERDICT r3
    asked for this to be explicit and unit-testable — tests/test_router.py
    pins every boundary):

    | engine      | qubits             | drive sets                       |
    |-------------|--------------------|----------------------------------|
    | 'streamed'  | 10 .. 17           | Pauli X/Y 1q, diag, hops; the    |
    |             | (< _PACKED_MIN)    | (palindromic) op list fits 128   |
    |             |                    | angle lanes                      |
    | 'packed'    | 18                 | + every diag control two-valued  |
    |             | (.. _VMEM_PACKED_  | (≤120 terms, int32 bit-planes)   |
    |             | MAX)               |                                  |
    | 'mega'      | 19 .. 24, hop-free | packed-phase chunked HBM engine  |
    | 'mega_hop'  | 19 .. 24 with hops | + feasible chunk layout for the  |
    |             |                    | hop graph (palindromic schedule) |
    | 'xla'       | everything else    | lax.scan product engine          |

    Returns the engine name; 'xla' means no fused Pallas engine applies
    (:func:`fused_eligible` is exactly ``select_engine(ham) != 'xla'``).
    """
    if ham.structure is None or not (10 <= ham.n_qubits <= 24):
        return "xla"
    if ham.h0_structure is None or ham.h0_structure.kind != "diag":
        return "xla"
    slot = _analysis_slot(ham)
    if "engine" in slot:
        return slot["engine"]
    slot["engine"] = eng = _select_engine_uncached(ham)
    return eng


def _select_engine_uncached(ham: ControlledHamiltonian) -> str:
    n = ham.n_qubits
    n_rot, used, hop_entries = 0, [], []
    for st in ham.structure:
        if st.kind == "1q" and _pauli_kind(st.local) is None:
            g = np.asarray(st.local)
            diag_local = (np.allclose(g, np.diag(np.diagonal(g)),
                                      atol=1e-12)
                          and np.max(np.abs(np.diagonal(g).imag)) < 1e-12)
            if not diag_local:  # diagonal 1q (Z-like) folds into phases
                return "xla"
            continue  # folds into the phases, costs no rotation slot
        if st.kind == "hop":
            hop_entries.append((min(st.qubit, st.qubit2),
                                max(st.qubit, st.qubit2)))
            n_rot += 1
            used += [st.qubit, st.qubit2]
        elif st.kind == "1q":
            n_rot += 1
            used.append(st.qubit)
        elif st.kind != "diag":
            return "xla"
    # every fused kernel streams the op sequence through the 128 angle
    # lanes of one tx row; the VMEM kernels double the row for
    # shared-qubit (palindromic) sequences, 19+q engines halve angle
    # VALUES instead
    doubled = 2 if (n <= _VMEM_PACKED_MAX
                    and len(set(used)) < len(used)) else 1
    if n_rot * doubled > 128:
        return "xla"
    if n < _PACKED_MIN_QUBITS:
        return "streamed"
    # 18+: the packed-phase form is mandatory (no [n_steps, d] tables fit)
    try:
        packed = _packed_form(ham)
    except ValueError:
        return "xla"
    if packed is None:
        return "xla"
    if n <= _VMEM_PACKED_MAX:
        return "packed"
    if hop_entries:
        from ..ops.fused_mega_hop import plan_chunked_hop_layout
        if plan_chunked_hop_layout(hop_entries,
                                   ("hop",) * len(hop_entries), n) is None:
            return "xla"
        return "mega_hop"
    return "mega"


def fused_eligible(ham: ControlledHamiltonian) -> bool:
    """Whether a fused Pallas evolution engine applies: 10-24 qubits,
    diagonal H0, every 1q term a Pauli X or Y, hops at streamed sizes.

    - 10-17: always (VMEM-resident whole-evolution kernels, streamed or
      packed-phase form); 'hop' (XX+YY) pairs supported by the STREAMED
      kernels (ordered op plan, {01,10}-mask rotations — the molecule
      drive sets), provided the possibly-palindromic op sequence fits the
      128 angle lanes;
    - 18: additionally need the packed-phase form (every diagonal
      control row two-valued, ≤120 terms — Pauli-Z strings qualify) so the
      kernel computes phases in-kernel and keeps HBM-resident boundary
      buffers, staying under the VMEM budget (:mod:`..ops.fused_product`
      packed kernels); hop pairs ride the packed op plan here too
      (tests/test_router.py pins 18q hops → 'packed');
    - 19-24: packed-phase form on the chunked HBM-state engine
      (:mod:`..ops.fused_chunked`) in its single-call MEGA form. The
      per-call two-passes-per-step programs crashed the remote compile
      helper past 22q; the mega kernels compile in ~1 min and run 23q at
      276 ms / 24q at 562 ms per 30-step value+grad chain (measured on
      chip, clean 2x-per-qubit scaling). 24 = the engine's architectural
      max (pass-B blocks need >= 8 sublanes)."""
    return select_engine(ham) != "xla"


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
    docs/PERFORMANCE.md).

    When every diagonal control row is two-valued (Pauli-Z strings — the
    whole QAOA/TFIM/XXZ family), the phase angles are computed IN-KERNEL
    from one packed int32 sign plane instead of streaming [n_steps, d]
    angle tables (packed kernels, :mod:`..ops.fused_product`); that form
    also carries 18-19 qubit states (HBM-resident boundary buffers)."""
    from ..ops.fused_product import (fused_product_evolve,
                                     fused_product_evolve_packed)

    if precision not in ("full", "fast"):
        raise ValueError(f"precision must be 'full' or 'fast', "
                         f"got {precision!r}")
    fast = precision == "fast"

    n = ham.n_qubits
    (diag_idx, diag_rows, h0_diag, oneq_idx, oneq_qubits, oneq_locals,
     hop_idx, hop_pairs) = split_structure_ext(ham)

    from .propagator import time_grid
    dt = (T - T0) / n_steps
    ts = time_grid(T0, dt, n_steps, t_sample)
    rdt = jnp.float32
    dtc = jnp.asarray(dt, rdt)

    # Packed phases are a CAPABILITY form, not a speed win at small n:
    # on-chip A/B (docs/PERFORMANCE.md round 3) measures the streamed
    # kernels 5-20% faster for 10-17 qubits (the in-kernel sign unpacking
    # costs more VPU than the angle tables cost bandwidth there), while
    # 18+ qubits REQUIRE the packed form (no [n_steps, d] tables fit).
    packed = _packed_form(ham) if n >= _PACKED_MIN_QUBITS else None
    # hops: streamed kernels <= 17q (packed is already None there, so
    # they carry the hop op plan), packed VMEM kernels at 18q, the
    # palindromic-schedule mega engine (fused_mega_hop) at 19-24q
    hop_mega = bool(hop_pairs) and n > _VMEM_PACKED_MAX
    if packed is None and n >= 18:
        raise ValueError(
            "18+ qubit fused evolution needs the packed-phase form "
            "(every diagonal control row two-valued, ≤120 terms); use "
            "backend='product' for general diagonals at this size")

    def packed_evolve(psi_b, ud_full, th_x, h0th, signs_arr, qubits, kinds):
        """Packed dispatch: VMEM whole-evolution kernel while the state
        fits physical VMEM (_VMEM_PACKED_MAX), the chunked HBM-state
        engine past that — in its single-call MEGA form: equal on-chip
        step latency to the two-passes-per-step form (20q grad 55.8 vs
        57.3 ms, 22q 145.6 vs 138 ms) but ~20x faster to compile (20q
        forward: 36 s vs 724 s — one kernel vs 60+ chained pallas calls),
        and compile time is the binding constraint on this toolchain.
        Hop drive sets take the palindromic-schedule hop mega engine.
        psi_b/ud_full/th_x carry a leading batch dim (chunked engine runs
        per-seed)."""
        if n <= _VMEM_PACKED_MAX:
            return fused_product_evolve_packed(
                psi_b, ud_full, th_x, h0th, signs_arr, qubits, n, kinds,
                fast)
        if hop_mega:
            run = functools.partial(_mega_hop_dispatch, h0th=h0th,
                                    signs_arr=signs_arr, entries=qubits,
                                    kinds=kinds, n=n, fast=fast)
            if psi_b.re.shape[0] == 1:
                out = run(CP(psi_b.re[0], psi_b.im[0]), ud_full[:, 0],
                          th_x[:, 0])
                return CP(out.re[None], out.im[None])
            # seed populations compile ONCE: the batched hop kernel grids
            # over (B, n_steps + 1) (round 4 Python-looped here — one
            # ~1 min mega-kernel compile per seed at 20q, VERDICT r4 #4)
            return run(psi_b, ud_full, th_x, batched=True)
        if psi_b.re.shape[0] == 1:
            from ..ops.fused_chunked import chunked_evolve_mega
            out = chunked_evolve_mega(
                CP(psi_b.re[0], psi_b.im[0]), ud_full[:, 0], th_x[:, 0],
                h0th, signs_arr, qubits, n, kinds, fast)
            return CP(out.re[None], out.im[None])
        # seed populations compile ONCE: the batched mega kernel grids
        # over (B, n_steps + 1) instead of emitting one mega kernel per
        # seed (round 3 Python-looped here — 64 compiles at 20q)
        from ..ops.fused_chunked import chunked_evolve_mega_batched
        return chunked_evolve_mega_batched(psi_b, ud_full, th_x, h0th,
                                           signs_arr, qubits, n, kinds,
                                           fast)

    diag_table = diag_rows_device(diag_rows, ham.dim, rdt)
    h0_vec = diag_vec_device(h0_diag, rdt)
    di = jnp.asarray(diag_idx, dtype=jnp.int32)
    qi = jnp.asarray(oneq_idx, dtype=jnp.int32)
    hi = jnp.asarray(hop_idx, dtype=jnp.int32)

    def with_hops(entries, kinds, theta_x, hop_block, axis):
        """Append the hop rotation entries: kernel angle = 2 x (dt x u)
        (the {01,10} subspace rotates by twice the hop angle —
        :func:`apply_hop_rot`), concatenated after the 1q columns in the
        :func:`_make_strang_step` op order [1q..., hop...]."""
        if not hop_pairs:
            return entries, kinds, theta_x
        return (tuple(entries) + tuple(hop_pairs),
                tuple(kinds) + ("hop",) * len(hop_pairs),
                jnp.concatenate([theta_x, 2.0 * hop_block], axis=axis))

    def packed_tables(u_diag_tk):
        """[T, ..., n_diag] diag controls → (ud_full [T, ..., n_diag+1],
        h0th [d], signs [P, d]) for the packed kernels. The sign planes
        are built ON DEVICE from parity masks whenever the rows are
        Pauli-Z-string-shaped (they virtually always are) — a [P, d]
        int32 constant is 4-16 MiB of serialized program at 20-24q
        (:func:`..ops.fused_product.parity_sign_masks`)."""
        from ..ops.fused_product import (parity_sign_masks,
                                         signs_planes_device)
        par = parity_sign_masks(diag_rows)
        if par is not None:
            masks, consts, scales = par
            signs_arr = signs_planes_device(masks, ham.dim)
        else:
            signs_np, consts, scales = packed
            signs_arr = jnp.asarray(signs_np) if signs_np.size else \
                jnp.zeros((1, ham.dim), jnp.int32)
        half = 0.5 * dtc
        ud_core = half * u_diag_tk * jnp.asarray(scales, rdt)
        off = half * jnp.einsum("...k,k->...", u_diag_tk,
                                jnp.asarray(consts, rdt), precision=_HP)
        ud_full = jnp.concatenate([ud_core, off[..., None]], axis=-1)
        return ud_full, (half * h0_vec).astype(rdt), signs_arr

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
        theta_x = dtc * jnp.moveaxis(u_oneq, 2, 0)     # [T, B, n_x]
        kinds = tuple(_pauli_kind(g) for g in oneq_locals)
        if any(k is None for k in kinds):
            raise ValueError(
                "fused backend supports Pauli X/Y 1q drives only (diagonal "
                "locals fold into the phases); use backend='product' for "
                "general involutory generators")
        oneq_qubits, kinds, theta_x = with_hops(
            oneq_qubits, kinds, theta_x,
            dtc * jnp.moveaxis(jnp.take(u, hi, axis=1).astype(rdt), 2, 0),
            axis=2)
        if not hop_mega:  # the hop mega engine palindromizes internally
            oneq_qubits, kinds, theta_x = _symmetrize_rots(
                oneq_qubits, kinds, theta_x, axis=2)

        if packed is not None:
            ud_full, h0th, signs_arr = packed_tables(
                jnp.moveaxis(u_diag, 2, 0))  # [T, B, n_diag(+1)]

            def run(p, th_x, s0=None, s1=None):
                return packed_evolve(
                    p, ud_full if s0 is None else ud_full[:, s0:s1],
                    th_x, h0th, signs_arr, tuple(oneq_qubits), kinds)
            planes = 10  # y/l/temps + in-VMEM boundary; no table streams
        else:
            theta_half = 0.5 * dtc * (
                h0_vec[None, None, :] + jnp.einsum(
                    "bkt,kd->tbd", u_diag, diag_table, precision=_HP))

            def run(p, th_x, s0=None, s1=None):
                return fused_product_evolve_batched(
                    p, theta_half if s0 is None else theta_half[:, s0:s1],
                    th_x, tuple(oneq_qubits), n, kinds, fast)
            planes = 14  # + streamed angle/gradient table double-buffers

        # chunk the batch so the backward kernel's VMEM footprint stays
        # within budget: the packed kernels raise Mosaic's scoped-vmem
        # window toward the ~128 MiB physical VMEM (measured, round 3);
        # the streamed kernels keep the conservative default window
        psi32f = psi0.astype(rdt)
        if packed is not None and n > _VMEM_PACKED_MAX:
            # HBM-resident mega engines: the VMEM footprint is slab-sized
            # (not state-sized), so the whole seed population runs as one
            # batched kernel — no VMEM-budget batch chunking
            return run(psi32f, theta_x)
        r_rows = ham.dim // 128
        bytes_per_seed = r_rows * 128 * 4 * planes
        budget = (64 if packed is not None else 12) * 2**20
        b_max = max(1, int(budget // bytes_per_seed))
        if packed is not None and n >= _PACKED_MIN_QUBITS:
            # 18q VMEM-packed kernels: Mosaic's measured scoped appetite
            # is ~13.4 MiB/seed forward and ~42.6 MiB/seed backward
            # against the 28 / 48 MiB windows (chip-measured round 4,
            # the MC-estimator branch batch OOMed at chunk=4) — only
            # b=1 kernels are safe once gradients flow
            b_max = 1
        chunk = 1
        while chunk * 2 <= min(b, b_max):
            chunk *= 2
        psi32 = psi0.astype(rdt)
        if chunk >= b:
            return run(psi32, theta_x)
        outs = []
        for s0 in range(0, b, chunk):
            s1 = min(s0 + chunk, b)
            outs.append(run(psi32[s0:s1], theta_x[:, s0:s1], s0, s1))
        return CP(jnp.concatenate([o.re for o in outs], axis=0),
                  jnp.concatenate([o.im for o in outs], axis=0))

    u = envelope.amplitudes(coeff, ts, horizon)  # [n_controls, n_steps]
    u_diag = (u[di] if diag_idx else
              jnp.zeros((0, n_steps), dtype=u.dtype)).astype(rdt)
    u_oneq = (u[qi] if oneq_idx else
              jnp.zeros((0, n_steps), dtype=u.dtype)).astype(rdt)

    theta_x = dtc * u_oneq.T  # [n_steps, n_x]

    kinds = tuple(_pauli_kind(g) for g in oneq_locals)
    if any(k is None for k in kinds):
        raise ValueError(
            "fused backend supports Pauli X/Y 1q drives only (diagonal "
            "locals fold into the phases); use backend='product' for "
            "general involutory generators")
    u_hop = (u[hi] if hop_idx else
             jnp.zeros((0, n_steps), dtype=u.dtype)).astype(rdt)
    oneq_qubits, kinds, theta_x = with_hops(
        oneq_qubits, kinds, theta_x, dtc * u_hop.T, axis=1)
    if not hop_mega:  # the hop mega engine palindromizes internally
        oneq_qubits, kinds, theta_x = _symmetrize_rots(
            oneq_qubits, kinds, theta_x, axis=1)

    if packed is not None:
        ud_full, h0th, signs_arr = packed_tables(u_diag.T)  # [T, n_diag+1]
        out = packed_evolve(
            CP(psi0.re[None], psi0.im[None]).astype(rdt),
            ud_full[:, None, :], theta_x[:, None, :], h0th, signs_arr,
            tuple(oneq_qubits), kinds)
        return CP(out.re[0], out.im[0])

    theta_half = 0.5 * dtc * (h0_vec[None, :]
                              + jnp.matmul(u_diag.T, diag_table,
                                           precision=_HP))
    out = fused_product_evolve(psi0.astype(rdt), theta_half, theta_x,
                               tuple(oneq_qubits), n, kinds, fast)
    return out


def _prepare_product_inputs(ham, envelope, coeff, T0, T, horizon, n_steps,
                            t_sample):
    """Shared setup for the XLA product engines: split the structure,
    evaluate the envelopes on the time grid, and build the per-step control
    tables. Returns (n, dt, h0_vec, diag_table, oneq data, hop data,
    u-tables transposed to [n_steps, ...])."""
    n = ham.n_qubits
    (diag_idx, diag_rows, h0_diag, oneq_idx, oneq_qubits,
     oneq_locals, hop_idx, hop_pairs) = split_structure_ext(ham)

    from .propagator import time_grid
    dt = (T - T0) / n_steps
    ts = time_grid(T0, dt, n_steps, t_sample)
    u = envelope.amplitudes(coeff, ts, horizon)  # [n_controls, n_steps]
    rdt = ham.dtype

    diag_table = diag_rows_device(diag_rows, ham.dim, rdt)
    h0_vec = diag_vec_device(h0_diag, rdt)

    def pick(idx):
        return (u[jnp.asarray(idx, dtype=jnp.int32)] if idx else
                jnp.zeros((0, n_steps), dtype=u.dtype)).astype(rdt)

    u_diag, u_oneq, u_hop = pick(diag_idx), pick(oneq_idx), pick(hop_idx)
    locals_re = [jnp.asarray(g.real, dtype=rdt) for g in oneq_locals]
    locals_im = [jnp.asarray(g.imag, dtype=rdt) for g in oneq_locals]
    return (n, jnp.asarray(dt, dtype=rdt), h0_vec, diag_table,
            oneq_qubits, locals_re, locals_im, hop_pairs,
            u_diag, u_oneq, u_hop)


def _make_strang_step(n, dt, h0_vec, diag_table, oneq_qubits, locals_re,
                      locals_im, hop_pairs):
    """The ONE Strang step body shared by :func:`evolve_product` and
    :func:`evolve_product_trajectory`: half diagonal phase, 1q/hop
    rotations (palindromic when drives share a qubit), half phase.

    Two non-commuting drives sharing a qubit (the X+Y two-quadrature pair,
    or a hop overlapping a 1q drive) break the naive sequential sub-step
    product's palindrome and silently degrade the splitting to first
    order; a half-angle forward + half-angle reversed sweep restores
    O(dt^2) global error. Disjoint terms commute, so the cheap single
    sweep is kept for them (static decision at trace time)."""
    rot_ops = [("1q", i) for i in range(len(oneq_qubits))] \
        + [("hop", j) for j in range(len(hop_pairs))]
    used = list(oneq_qubits) + [q for pr in hop_pairs for q in pr]
    palindromic = len(set(used)) < len(used)
    order = rot_ops + rot_ops[::-1] if palindromic else rot_ops
    frac = 0.5 * dt if palindromic else dt

    def step(psi, xs):
        ud, uq, uh = xs  # [n_diag], [n_oneq], [n_hop]
        # total diagonal this step: h0 + sum_k ud[k] diag_k → [d]
        theta_half = (0.5 * dt) * (h0_vec + jnp.matmul(ud, diag_table,
                                                       precision=_HP))
        ph = _phase(theta_half)
        psi = cpx.mul(CP(jnp.broadcast_to(ph.re, psi.re.shape),
                         jnp.broadcast_to(ph.im, psi.im.shape)), psi)
        for kind, i in order:
            if kind == "1q":
                psi = apply_1q_pauli_rot(psi, frac * uq[i], oneq_qubits[i],
                                         n, locals_re[i], locals_im[i])
            else:
                qi, qj = hop_pairs[i]
                psi = apply_hop_rot(psi, frac * uh[i], qi, qj, n)
        psi = cpx.mul(CP(jnp.broadcast_to(ph.re, psi.re.shape),
                         jnp.broadcast_to(ph.im, psi.im.shape)), psi)
        return psi

    return step


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
    (n, dt, h0_vec, diag_table, oneq_qubits, locals_re, locals_im,
     hop_pairs, u_diag, u_oneq, u_hop) = _prepare_product_inputs(
        ham, envelope, coeff, T0, T, horizon, n_steps, t_sample)

    body = _make_strang_step(n, dt, h0_vec, diag_table, oneq_qubits,
                             locals_re, locals_im, hop_pairs)

    @jax.checkpoint
    def step(psi, xs):
        return body(psi, xs), None

    psi, _ = jax.lax.scan(step, psi0.astype(ham.dtype),
                          (u_diag.T, u_oneq.T, u_hop.T))
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
    (n, dt, h0_vec, diag_table, oneq_qubits, locals_re, locals_im,
     hop_pairs, u_diag, u_oneq, u_hop) = _prepare_product_inputs(
        ham, envelope, coeff, T0, T, horizon, n_steps, t_sample)

    body = _make_strang_step(n, dt, h0_vec, diag_table, oneq_qubits,
                             locals_re, locals_im, hop_pairs)

    def step(psi, xs):
        psi = body(psi, xs)
        return psi, psi

    psi0 = psi0.astype(ham.dtype)
    _, traj = jax.lax.scan(step, psi0, (u_diag.T, u_oneq.T, u_hop.T))
    return CP(jnp.concatenate([psi0.re[None], traj.re], axis=0),
              jnp.concatenate([psi0.im[None], traj.im], axis=0))
