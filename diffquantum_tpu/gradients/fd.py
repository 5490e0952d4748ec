"""Central finite-difference gradients — the reference's comparison baseline.

Rebuilds ``compute_energy_grad_FD`` (`/root/reference/sim_plain.py:308-353`):
for every coefficient (k, j), run two full forward simulations at
``c ± delta e_kj`` and take ``(E_p - E_m) / (2 delta)``.

TPU mapping: all ``2 * n_Hs * n_basis`` perturbed simulations run as ONE
vmapped batch — a single scan whose steps do ``[B, n_basis] x [n_basis, d]``
envelope matmuls and batched state matvecs, instead of the reference's
serial ``qp.mesolve`` calls (`sim_plain.py:343-351`).

Documented divergence: the reference's FD path hardcodes the time grid to
``linspace(0, 1, n_step)`` regardless of T (`sim_plain.py:320` — the "T=1
trap" noted in SURVEY.md §7). We integrate over the true horizon [0, T] with
the same grid as the loss path, so FD/MC/adjoint gradients are comparable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..dynamics.propagator import evolve
from ..measure import (Measurement, exact_expectation, measurement_noise,
                       stochastic_measure)


@functools.partial(
    jax.jit,
    static_argnames=("envelope", "T", "n_steps", "backend", "delta",
                     "sampling", "noisy", "per_pauli", "precision", "t_sample"))
def fd_energy_grad(
    ham,
    envelope,
    measurement: Measurement,
    coeff: jnp.ndarray,
    psi0: jnp.ndarray,
    T: float,
    key: jax.Array,
    n_steps: int,
    backend: str = "auto",
    delta: float = 1e-3,
    sampling: bool = False,
    noisy: bool = False,
    per_pauli: int = 100,
    precision: str = "full",
    t_sample: str = "left",
) -> jnp.ndarray:
    """Central-difference gradient over all coefficients, one vmapped batch."""
    shape = coeff.shape
    n_params = coeff.size
    flat = coeff.reshape(-1)

    eye = jnp.eye(n_params, dtype=coeff.dtype) * delta
    plus = flat[None, :] + eye
    minus = flat[None, :] - eye
    all_coeffs = jnp.concatenate([plus, minus], axis=0).reshape(
        (2 * n_params,) + shape)

    def one_sim(c, k):
        psi = evolve(ham, envelope, c, psi0, 0.0, T, horizon=T, precision=precision,
                     n_steps=n_steps, backend=backend, t_sample=t_sample)
        if sampling:
            from ..measure import DiagonalTermSet, stochastic_measure_diag
            k1, k2 = jax.random.split(k)
            if measurement.strings is not None:
                from ..measure import stochastic_measure_strings
                e = stochastic_measure_strings(measurement.strings, psi, k1,
                                               per_pauli)
            else:
                sampler = stochastic_measure_diag \
                    if isinstance(measurement.terms, DiagonalTermSet) \
                    else stochastic_measure
                e = sampler(measurement.terms, psi, k1, per_pauli)
        elif measurement.strings is not None:
            e = measurement.strings.expectation(psi)
            k2 = k
        elif measurement.diag is not None:
            # matrix-free diagonal observable (structured problems build
            # Measurement.create_diagonal — no dense M exists >13 qubits)
            from ..ops import cpx
            e = jnp.sum(cpx.abs2(psi) * measurement.diag, axis=-1)
            k2 = k
        else:
            e = exact_expectation(measurement.matrix, psi)
            k2 = k
        if noisy:
            e = measurement_noise(e, k2)
        return e

    keys = jax.random.split(key, 2 * n_params)
    energies = jax.vmap(one_sim)(all_coeffs, keys)
    e_p, e_m = energies[:n_params], energies[n_params:]
    return ((e_p - e_m) / (2.0 * delta)).reshape(shape)
