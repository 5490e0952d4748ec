"""Adjoint (reverse-mode) gradients through the propagator.

The reference cannot differentiate through its propagator at all — its
gradients come only from the MC estimator or finite differences
(`/root/reference/sim_plain.py:156-231,308-353`). Here the whole chain
coefficients → envelopes → scan of matrix exponentials → expectation is a
differentiable JAX program, so ``jax.grad`` yields the exact gradient in one
forward + one reverse pass (vs the reference's ``1 + 2 n_Hs`` forward
evolutions per MC sample). The scan body is `jax.checkpoint`-ed
(:mod:`..dynamics.propagator`) so the reverse pass rematerializes steps
instead of storing every intermediate state — the "16-qubit, 1000-step
checkpointed adjoint" configuration of BASELINE.md runs in O(d) live memory
per step.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..dynamics.propagator import evolve
from ..measure import exact_expectation
from ..ops import cpx
from ..ops.cpx import CP


@functools.partial(jax.jit, static_argnames=("envelope", "T", "n_steps", "backend", "precision", "t_sample"))
def energy_and_grad(ham, envelope, m, coeff: jnp.ndarray,
                    psi0: CP, T: float, n_steps: int,
                    backend: str = "auto", precision: str = "full",
                    t_sample: str = "left"):
    """(<psi(T)|M|psi(T)>, d/dcoeff) by reverse-mode autodiff.

    ``m``: a CP dense operator, a real diagonal vector (matrix-free
    observable), or a Measurement (its exact path is used). Everything is
    real-valued (CP pairs), so this is plain real reverse-mode — no
    complex-autodiff convention subtleties."""

    def loss(c):
        psi = evolve(ham, envelope, c, psi0, 0.0, T, horizon=T,
                     n_steps=n_steps, backend=backend, precision=precision,
                     t_sample=t_sample)
        if isinstance(m, CP):
            return exact_expectation(m, psi)
        if isinstance(m, jnp.ndarray) or hasattr(m, "shape"):
            return jnp.sum(cpx.abs2(psi) * m, axis=-1)  # diagonal M
        if m.diag is not None:
            return jnp.sum(cpx.abs2(psi) * m.diag, axis=-1)
        if getattr(m, "strings", None) is not None:
            return m.strings.expectation(psi)
        return exact_expectation(m.matrix, psi)

    return jax.value_and_grad(loss)(coeff)


@functools.partial(jax.jit, static_argnames=("envelope", "T", "n_steps", "backend", "precision", "t_sample"))
def fidelity_and_grad(ham, envelope, target: CP, coeff: jnp.ndarray,
                      psi0: CP, T: float, n_steps: int,
                      backend: str = "auto", precision: str = "full",
                      t_sample: str = "left"):
    """(1 - |<target|psi(T)>|^2, d/dcoeff) by reverse-mode autodiff."""

    def loss(c):
        psi = evolve(ham, envelope, c, psi0, 0.0, T, horizon=T,
                     n_steps=n_steps, backend=backend, precision=precision,
                     t_sample=t_sample)
        ov = cpx.vdot(target, psi)
        return 1.0 - (ov.re * ov.re + ov.im * ov.im)

    return jax.value_and_grad(loss)(coeff)
