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
    sampling: bool = False
    noisy: bool = False
    per_pauli: int = 100

    def tree_flatten(self):
        return (self.matrix, self.terms, self.diag, self.target), (
            self.sampling, self.noisy, self.per_pauli)

    @classmethod
    def tree_unflatten(cls, aux, children):
        matrix, terms, diag, target = children
        sampling, noisy, per_pauli = aux
        return cls(matrix=matrix, terms=terms, diag=diag, target=target,
                   sampling=sampling, noisy=noisy, per_pauli=per_pauli)

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
            elif isinstance(self.terms, DiagonalTermSet):
                val = stochastic_measure_diag(self.terms, psi, sub,
                                              self.per_pauli)
            else:
                val = stochastic_measure(self.terms, psi, sub, self.per_pauli)
        elif self.diag is not None:
            val = jnp.sum(cpx.abs2(psi) * self.diag, axis=-1)
        elif self.target is not None:
            val = target_overlap_prob(self.target, psi)
        else:
            val = exact_expectation(self.matrix, psi)
        if self.noisy:
            if key is None:
                raise ValueError("noisy measurement needs a PRNG key")
            _, sub = jax.random.split(key)
            val = measurement_noise(val, sub)
        return val
