"""Quantum measurement: exact expectations, shot-sampled Pauli estimation,
and hardware-noise injection — on the real-pair (CP) state representation.

Rebuilds the reference's measurement layer:

- exact expectation ``<psi|M|psi>`` — `M.matrix_element(final, final)`
  (`/root/reference/sim_plain.py:281,205,215`);
- ``stochastic_measure`` — finite-shot Pauli-term estimation by Born sampling
  of each term's eigenbasis (`/root/reference/sim_plain.py:101-117`,
  ``per_Pauli=100`` shots per term hardcoded there; a parameter here);
- Gaussian measurement noise with scale ``|value|/5``
  (`/root/reference/sim_plain.py:207-208,217-218,283-284`).

TPU-shaped: sampling uses ``jax.random.categorical`` over log-Born
probabilities with a one-hot bincount (no host RNG / np.random.choice), fully
jit/vmap-compatible so noisy-measurement training loops stay on device.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .ops import cpx
from .ops.cpx import CP

NOISE_REL_SCALE = 0.2  # reference: np.random.normal(scale=|v|/5)


def exact_expectation(m: CP, psi: CP) -> jnp.ndarray:
    """Re <psi|M|psi> (psi may carry leading batch dims)."""
    mp = cpx.matvec(m, psi)
    return jnp.sum(psi.re * mp.re + psi.im * mp.im, axis=-1)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PauliTermSet:
    """Measurement operator decomposed into weighted Hermitian terms with
    precomputed eigensystems — the reference's ``self.Pauli_M`` table
    (`demo_maxcut.py:47-65`, entries ``[matrix, weight, (evals, estates)]``).

    evals:   [n_terms, d]      real eigenvalues per term
    estates: CP [n_terms, d, d] eigenvectors as columns per term
    weights: [n_terms]
    """

    weights: jnp.ndarray
    evals: jnp.ndarray
    estates: CP

    def tree_flatten(self):
        return (self.weights, self.evals, self.estates), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, terms: Sequence[tuple[np.ndarray, float]],
               dtype=jnp.float32) -> "PauliTermSet":
        """From (matrix, weight) pairs; eigendecomposition done once in
        numpy at setup (matches `demo_maxcut.py:64-65`)."""
        ws, evs, ests = [], [], []
        for m, w in terms:
            ev, es = np.linalg.eigh(np.asarray(m))
            ws.append(float(w))
            evs.append(ev)
            ests.append(es)
        return cls(weights=jnp.asarray(ws, dtype=dtype),
                   evals=jnp.asarray(np.stack(evs), dtype=dtype),
                   estates=cpx.from_complex(np.stack(ests), dtype=dtype))

    @property
    def n_terms(self) -> int:
        return self.weights.shape[0]


def stochastic_measure(terms: PauliTermSet, psi: CP, key: jax.Array,
                       per_pauli: int = 100) -> jnp.ndarray:
    """Finite-shot estimate of sum_i w_i <psi|P_i|psi>.

    For each term: Born distribution p_j = |<e_j|psi>|^2 over its
    eigenstates, ``per_pauli`` categorical draws, estimate
    ``w * sum_j eval_j freq_j / shots`` (`sim_plain.py:101-117`).
    """
    # amplitude of psi on eigenvector j of term t: <e_j|psi> with
    # estates[t, :, j] as columns → contract the middle (d) axis.
    er = jnp.swapaxes(terms.estates.re, -1, -2)  # [t, j, d]
    ei = jnp.swapaxes(terms.estates.im, -1, -2)
    amp_re = jnp.einsum("tjd,d->tj", er, psi.re, precision=jax.lax.Precision.HIGHEST) \
        + jnp.einsum("tjd,d->tj", ei, psi.im, precision=jax.lax.Precision.HIGHEST)
    amp_im = jnp.einsum("tjd,d->tj", er, psi.im, precision=jax.lax.Precision.HIGHEST) \
        - jnp.einsum("tjd,d->tj", ei, psi.re, precision=jax.lax.Precision.HIGHEST)
    probs = amp_re**2 + amp_im**2  # [n_terms, d]
    logp = jnp.log(jnp.maximum(probs, 1e-30))
    draws = jax.random.categorical(
        key, logp[:, None, :].repeat(per_pauli, axis=1), axis=-1)  # [t, shots]
    onehot = jax.nn.one_hot(draws, probs.shape[-1], dtype=probs.dtype)
    freqs = onehot.sum(axis=1) / per_pauli  # [t, d]
    return jnp.sum(terms.weights * jnp.sum(terms.evals * freqs, axis=-1))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DiagonalTermSet:
    """Weighted DIAGONAL terms (the maxcut cost decomposes entirely into ZZ
    strings + identity, `demo_maxcut.py:47-65`): eigenbasis is the
    computational basis, so Born sampling reads |psi_j|^2 directly — no
    eigendecompositions, scales to any qubit count.

    weights: [n_terms]; diags: [n_terms, d] (the terms' diagonals).
    """

    weights: jnp.ndarray
    diags: jnp.ndarray

    def tree_flatten(self):
        return (self.weights, self.diags), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, terms: Sequence[tuple[np.ndarray, float]],
               dtype=jnp.float32) -> "DiagonalTermSet":
        """terms: (diag_vector, weight) pairs."""
        ws = jnp.asarray([w for _, w in terms], dtype=dtype)
        ds = jnp.asarray(np.stack([np.asarray(d) for d, _ in terms]),
                         dtype=dtype)
        return cls(weights=ws, diags=ds)

    @property
    def n_terms(self) -> int:
        return self.weights.shape[0]


def stochastic_measure_diag(terms: DiagonalTermSet, psi: CP, key: jax.Array,
                            per_pauli: int = 100) -> jnp.ndarray:
    """Finite-shot estimate for diagonal terms: independent ``per_pauli``
    computational-basis draws per term (matching the reference's per-term
    sampling, `sim_plain.py:104-116`)."""
    probs = cpx.abs2(psi)  # [d]
    logp = jnp.log(jnp.maximum(probs, 1e-30))
    n_terms = terms.n_terms
    draws = jax.random.categorical(
        key, jnp.broadcast_to(logp, (n_terms, per_pauli, logp.shape[-1])),
        axis=-1)  # [t, shots]
    vals = jnp.take_along_axis(terms.diags, draws, axis=-1)  # [t, shots]
    return jnp.sum(terms.weights * vals.mean(axis=-1))


def _bit_parity(v: jnp.ndarray) -> jnp.ndarray:
    """Parity (0/1) of the set bits of int32 v, branchless."""
    v = v ^ (v >> 16)
    v = v ^ (v >> 8)
    v = v ^ (v >> 4)
    v = v ^ (v >> 2)
    v = v ^ (v >> 1)
    return v & 1


def _parse_pauli_label(label: str) -> tuple[int, int, int]:
    """(flip_mask, yz_mask, n_y) for a Pauli string label, qubit 0 = MSB
    (the :func:`..ops.linalg.pauli_string` kron convention)."""
    n = len(label)
    flip = yz = n_y = 0
    for q, ch in enumerate(label.upper()):
        bit = 1 << (n - 1 - q)
        if ch == "X":
            flip |= bit
        elif ch == "Y":
            flip |= bit
            yz |= bit
            n_y += 1
        elif ch == "Z":
            yz |= bit
        elif ch != "I":
            raise ValueError(f"bad Pauli label char {ch!r} in {label!r}")
    return flip, yz, n_y


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PauliStringSet:
    """Matrix-free weighted Pauli-sum observable ``M = sum_t w_t P_t``.

    Each string acts on a computational-basis state as an XOR-mask index
    flip plus a parity sign: ``P|j> = i^{n_y} (-1)^{par(j & yz)} |j ^ flip>``
    — so ``<psi|M|psi>`` is a gather + elementwise product per term, O(d)
    memory, any qubit count. This is what lets energy training scale for
    NON-diagonal cost Hamiltonians (TFIM, Heisenberg, molecules): the
    reference (and the diag/target paths above) cover only diagonal costs
    and rank-1 projectors matrix-free.

    weights: [n_terms] real; masks are static host ints (pytree aux) so the
    gather indices constant-fold into the compiled program.
    """

    weights: jnp.ndarray
    flips: tuple          # static per-term XOR masks
    yz_masks: tuple       # static per-term sign masks (Y|Z bits)
    n_ys: tuple           # static per-term Y counts
    n_qubits: int = -1

    def tree_flatten(self):
        return (self.weights,), (self.flips, self.yz_masks, self.n_ys,
                                 self.n_qubits)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @classmethod
    def create(cls, terms: Sequence[tuple[str, float]],
               dtype=jnp.float32) -> "PauliStringSet":
        """terms: (label, weight) pairs, e.g. [("ZZI", -1.0), ("XII", -0.5)].
        All labels must have equal length (the qubit count)."""
        labels = [t[0] for t in terms]
        n = len(labels[0])
        if any(len(l) != n for l in labels):
            raise ValueError("all Pauli labels must have the same length")
        parsed = [_parse_pauli_label(l) for l in labels]
        return cls(
            weights=jnp.asarray([w for _, w in terms], dtype=dtype),
            flips=tuple(p[0] for p in parsed),
            yz_masks=tuple(p[1] for p in parsed),
            n_ys=tuple(p[2] for p in parsed),
            n_qubits=n)

    @property
    def n_terms(self) -> int:
        return len(self.flips)

    def expectation(self, psi: CP) -> jnp.ndarray:
        """sum_t w_t <psi|P_t|psi> for psi CP [..., d] (batch dims kept)."""
        d = 2**self.n_qubits
        j = jnp.arange(d, dtype=jnp.int32)
        total = 0.0
        for t in range(self.n_terms):
            jp = j ^ jnp.int32(self.flips[t])
            s = (1.0 - 2.0 * _bit_parity(jp & jnp.int32(self.yz_masks[t]))
                 ).astype(psi.re.dtype)
            pre = jnp.take(psi.re, jp, axis=-1) * s
            pim = jnp.take(psi.im, jp, axis=-1) * s
            g_re = jnp.sum(psi.re * pre + psi.im * pim, axis=-1)
            g_im = jnp.sum(psi.re * pim - psi.im * pre, axis=-1)
            e = (g_re, -g_im, -g_re, g_im)[self.n_ys[t] % 4]
            total = total + self.weights[t] * e
        return total

    def apply(self, psi: CP) -> CP:
        """(M psi) matrix-free — used by the MC estimator's branch gates."""
        d = 2**self.n_qubits
        j = jnp.arange(d, dtype=jnp.int32)
        out_re = jnp.zeros_like(psi.re)
        out_im = jnp.zeros_like(psi.im)
        for t in range(self.n_terms):
            jp = j ^ jnp.int32(self.flips[t])
            s = (1.0 - 2.0 * _bit_parity(jp & jnp.int32(self.yz_masks[t]))
                 ).astype(psi.re.dtype)
            pre = jnp.take(psi.re, jp, axis=-1) * s
            pim = jnp.take(psi.im, jp, axis=-1) * s
            w = self.weights[t]
            re, im = (
                (pre, pim), (-pim, pre), (-pre, -pim), (pim, -pre)
            )[self.n_ys[t] % 4]  # x i^{n_y}
            out_re = out_re + w * re
            out_im = out_im + w * im
        return CP(out_re, out_im)


import functools as _functools


@_functools.lru_cache(maxsize=None)
def qwc_groups(flips: tuple, yz_masks: tuple):
    """Greedy qubit-wise-commuting (QWC) grouping of Pauli strings.

    Two strings are QWC iff on every qubit their Paulis agree or at least
    one is identity — then ONE single-qubit basis rotation diagonalizes the
    whole group and one shot batch measures every member simultaneously.
    Returns a tuple of groups ``(x_mask, y_mask, z_mask, term_indices)``;
    masks are the union basis assignment of the group. Greedy first-fit in
    descending-support order (large strings constrain most, so place them
    first — measurably fewer groups than input order on molecular JW
    sums): O(n_terms * n_groups)."""
    order = sorted(range(len(flips)),
                   key=lambda t: -bin(flips[t] | yz_masks[t]).count("1"))
    groups = []  # [x_mask, y_mask, z_mask, [term indices]]
    for t in order:
        flip, yz = flips[t], yz_masks[t]
        xt, yt, zt = flip & ~yz, flip & yz, yz & ~flip
        for g in groups:
            conflict = ((xt & (g[1] | g[2])) | (yt & (g[0] | g[2]))
                        | (zt & (g[0] | g[1])))
            if not conflict:
                g[0] |= xt
                g[1] |= yt
                g[2] |= zt
                g[3].append(t)
                break
        else:
            groups.append([xt, yt, zt, [t]])
    return tuple((g[0], g[1], g[2], tuple(g[3])) for g in groups)


def stochastic_measure_strings(strings: PauliStringSet, psi: CP,
                               key: jax.Array,
                               per_pauli: int = 100) -> jnp.ndarray:
    """Finite-shot estimate of a Pauli-sum expectation, matrix-free and
    GROUPED: strings are partitioned into qubit-wise-commuting families
    (:func:`qwc_groups`); each family costs ONE basis rotation (X -> H,
    Y -> H S^dag per supported qubit) + ONE batch of ``per_pauli``
    computational-basis shots, and every member's eigenvalue
    ``(-1)^{par(j & support)}`` is read off the SAME draws — exactly how
    shots are spent on hardware. vs the naive per-term loop (the round-2
    form, and the scalable analog of the reference's per-term sampling,
    `/root/reference/sim_plain.py:101-117`): orders fewer sequential
    rotation+sample blocks for molecular JW sums, at the price of
    within-group shot covariance (still unbiased)."""
    import numpy as _np

    h = _np.array([[1, 1], [1, -1]]) / _np.sqrt(2)
    hsdag = h @ _np.diag([1.0, -1j])
    n = strings.n_qubits
    d = 2**n
    groups = qwc_groups(strings.flips, strings.yz_masks)
    keys = jax.random.split(key, len(groups))
    total = 0.0
    for gi, (x_mask, y_mask, _, terms_idx) in enumerate(groups):
        rot = psi
        for q in range(n):
            bit = 1 << (n - 1 - q)
            if x_mask & bit:
                rot = _apply_local(rot, q, n, h)
            elif y_mask & bit:
                rot = _apply_local(rot, q, n, hsdag)
        probs = cpx.abs2(rot).reshape(-1, d)  # flatten batch dims
        logp = jnp.log(jnp.maximum(probs, 1e-30))
        # one categorical call with a shape argument — no [batch,
        # per_pauli, d] logits materialization (tens of MB/term at 16+q)
        draws = jax.random.categorical(
            keys[gi], logp[:, None, :], axis=-1,
            shape=(probs.shape[0], per_pauli)).astype(jnp.int32)
        for t in terms_idx:
            support = strings.flips[t] | strings.yz_masks[t]
            ev = (1.0 - 2.0 * _bit_parity(draws & jnp.int32(support))
                  ).astype(probs.dtype)
            total = total + strings.weights[t] * ev.mean(axis=-1).reshape(
                psi.re.shape[:-1])
    return total


def _apply_local(psi: CP, qubit: int, n: int, local) -> CP:
    """2x2 complex gate on tensor axis `qubit` of CP [..., 2^n]."""
    import numpy as _np
    g = _np.asarray(local, dtype=complex)
    lead = psi.re.shape[:-1]
    left, right = 2**qubit, 2 ** (n - qubit - 1)
    shape = lead + (left, 2, right)
    pre, pim = psi.re.reshape(shape), psi.im.reshape(shape)
    gr = jnp.asarray(g.real, psi.re.dtype)
    gi = jnp.asarray(g.imag, psi.re.dtype)
    hp = jax.lax.Precision.HIGHEST
    re = jnp.einsum("ab,...lbr->...lar", gr, pre, precision=hp) \
        - jnp.einsum("ab,...lbr->...lar", gi, pim, precision=hp)
    im = jnp.einsum("ab,...lbr->...lar", gr, pim, precision=hp) \
        + jnp.einsum("ab,...lbr->...lar", gi, pre, precision=hp)
    flat = lead + (left * 2 * right,)
    return CP(re.reshape(flat), im.reshape(flat))


def target_overlap_prob(target: CP, psi: CP) -> jnp.ndarray:
    """|<t|psi>|^2 (psi may carry leading batch dims) — the matrix-free
    rank-1 projector expectation."""
    o = cpx.vdot(target, psi)
    return o.re * o.re + o.im * o.im


def sampled_target_prob(target: CP, psi: CP, key: jax.Array,
                        shots: int = 100) -> jnp.ndarray:
    """Finite-shot estimate of |<t|psi>|^2: measuring the projector
    |t><t| is a Bernoulli trial with success probability p — ``shots``
    draws, frequency estimate (the projector analog of
    `sim_plain.py:101-117`'s per-term Born sampling)."""
    p = target_overlap_prob(target, psi)
    draws = jax.random.bernoulli(key, jnp.clip(p, 0.0, 1.0),
                                 (shots,) + jnp.shape(p))
    return jnp.mean(draws.astype(p.dtype), axis=0)


def measurement_noise(value: jnp.ndarray, key: jax.Array,
                      rel_scale: float = NOISE_REL_SCALE) -> jnp.ndarray:
    """value + N(0, |value| * rel_scale) — `sim_plain.py:283-284`."""
    sigma = jnp.abs(value) * rel_scale
    return value + sigma * jax.random.normal(key, jnp.shape(value),
                                             dtype=jnp.result_type(value))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Measurement:
    """A measurement objective: dense operator (CP) + optional term
    decomposition + noise/sampling switches (the reference's
    `sampling_measure` / `is_noisy` flags, `sim_plain.py:30-31`)."""

    matrix: CP | None                   # [d, d] Hermitian (None if diagonal)
    terms: PauliTermSet | DiagonalTermSet | None = None
    diag: jnp.ndarray | None = None     # [d] real diagonal (matrix-free M)
    target: CP | None = None            # [d] state (matrix-free |t><t|)
    strings: PauliStringSet | None = None  # matrix-free Pauli sum
    sampling: bool = False
    noisy: bool = False
    per_pauli: int = 100

    def tree_flatten(self):
        return (self.matrix, self.terms, self.diag, self.target,
                self.strings), (self.sampling, self.noisy, self.per_pauli)

    @classmethod
    def tree_unflatten(cls, aux, children):
        matrix, terms, diag, target, strings = children
        sampling, noisy, per_pauli = aux
        return cls(matrix=matrix, terms=terms, diag=diag, target=target,
                   strings=strings, sampling=sampling, noisy=noisy,
                   per_pauli=per_pauli)

    @classmethod
    def create(cls, matrix, terms=None, dtype=jnp.float32, **kw) -> "Measurement":
        """From a host-side complex operator (+ optional (matrix, weight)
        term list for sampled measurement)."""
        term_set = PauliTermSet.create(terms, dtype=dtype) if terms else None
        return cls(matrix=cpx.from_complex(matrix, dtype=dtype),
                   terms=term_set, **kw)

    @classmethod
    def create_target(cls, target, dtype=jnp.float32, **kw) -> "Measurement":
        """Matrix-free rank-1 projector M = |t><t| from a target state: the
        fidelity objective of the control trainer (the reference builds the
        dense projector, `/root/reference/sim_plain.py:447` — impossible
        beyond ~13 qubits; here <psi|M|psi> = |<t|psi>|^2 is one vdot).

        ``target``: complex [d] array, or an existing CP pair."""
        t = target if isinstance(target, CP) \
            else cpx.from_complex(np.asarray(target), dtype=dtype)
        return cls(matrix=None, target=t, **kw)

    @classmethod
    def create_strings(cls, terms: Sequence[tuple[str, float]],
                       dtype=jnp.float32, **kw) -> "Measurement":
        """Matrix-free Pauli-sum observable from (label, weight) pairs,
        e.g. ``[("ZZI", -1.0), ("IXI", -0.5)]`` — exact AND shot-sampled
        paths scale to any qubit count (no dense matrix, no
        eigendecomposition)."""
        return cls(matrix=None,
                   strings=PauliStringSet.create(terms, dtype=dtype), **kw)

    @classmethod
    def create_diagonal(cls, diag, diag_terms=None, dtype=jnp.float32,
                        **kw) -> "Measurement":
        """Matrix-free diagonal observable (e.g. any cut/Ising cost):
        ``diag`` is the length-d real diagonal; ``diag_terms`` optional
        (diag_vector, weight) pairs for shot-sampled measurement."""
        term_set = DiagonalTermSet.create(diag_terms, dtype=dtype) \
            if diag_terms else None
        return cls(matrix=None, terms=term_set,
                   diag=jnp.asarray(np.asarray(diag), dtype=dtype), **kw)

    def expectation(self, psi: CP, key: jax.Array | None = None):
        """Measured value of <psi|M|psi> honoring sampling/noise flags.

        ``key`` is required when sampling or noisy."""
        if self.sampling:
            if key is None:
                raise ValueError("sampling measurement needs a PRNG key")
            key, sub = jax.random.split(key)
            if self.target is not None:
                val = sampled_target_prob(self.target, psi, sub,
                                          self.per_pauli)
            elif self.strings is not None:
                val = stochastic_measure_strings(self.strings, psi, sub,
                                                 self.per_pauli)
            elif isinstance(self.terms, DiagonalTermSet):
                val = stochastic_measure_diag(self.terms, psi, sub,
                                              self.per_pauli)
            elif self.terms is None and self.diag is not None:
                # diagonal observable with no explicit term table: sample it
                # directly as ONE diagonal term (Born draws from |psi|^2,
                # values read off the diagonal)
                one = DiagonalTermSet(
                    weights=jnp.ones((1,), self.diag.dtype),
                    diags=self.diag[None, :])
                val = stochastic_measure_diag(one, psi, sub, self.per_pauli)
            elif self.terms is None:
                raise ValueError(
                    "sampling measurement needs a term decomposition: pass "
                    "terms=/diag_terms= at construction (or use "
                    "create_strings / create_target)")
            else:
                val = stochastic_measure(self.terms, psi, sub, self.per_pauli)
        elif self.diag is not None:
            val = jnp.sum(cpx.abs2(psi) * self.diag, axis=-1)
        elif self.target is not None:
            val = target_overlap_prob(self.target, psi)
        elif self.strings is not None:
            val = self.strings.expectation(psi)
        else:
            val = exact_expectation(self.matrix, psi)
        if self.noisy:
            if key is None:
                raise ValueError("noisy measurement needs a PRNG key")
            _, sub = jax.random.split(key)
            val = measurement_noise(val, sub)
        return val
