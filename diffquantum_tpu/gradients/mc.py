"""The paper's unbiased Monte-Carlo gradient estimator — TPU-shaped.

Re-implements ``compute_energy_grad_MC`` (`/root/reference/
sim_plain.py:156-231`), the core contribution of the reference (hardware-
compatible gradients: forward evolutions + measurements only, no adjoint
state). Algorithm per sample:

1. draw ``s ~ U(0, T)``                              (`sim_plain.py:167`)
2. envelope sensitivity ``dD_k(s)/dc_kj`` of
   ``D_k = (2 sigmoid(A_k) - 1) omega_k``            (`sim_plain.py:169-184`)
3. evolve ``phi = U(s, 0) psi0``                     (`sim_plain.py:190`)
4. apply non-unitary perturbation gates
   ``(I ± r i H_k)/sqrt(1+r^2)``, r = 1/2            (`sim_plain.py:196-199`)
5. evolve both branches to T, measure ``<M>``        (`sim_plain.py:200-215`)
6. ``ps_k = sign * (1+r^2)/(2r) * (ps_m - ps_p)``    (`sim_plain.py:220`)
7. chain rule ``grad[k,j] = ps_k * dD_k/dc_kj``      (`sim_plain.py:222-230`)

TPU mapping: the ``2 n_Hs`` branch evolutions run as ONE batched scan over a
``[2 n_Hs, d]`` state block (MXU matmuls), not 2·n_Hs sequential solver calls
like the reference; multiple MC samples vmap on top. The gates are applied
matrix-free (one ``H_k @ phi`` matvec each, no dense gate construction).

Divergences from the reference, kept deliberately and documented:

- Time grids: the reference evolves 0→s and s→T on separate grids with
  data-dependent step counts (``per_step*(s+1)``, `sim_plain.py:123`), which
  cannot be jit-compiled. We use static step counts with traced ``dt`` —
  same piecewise-constant semantics, slightly finer discretization.
- ``chain='exact'`` (default) applies the full sigmoid chain rule for ALL
  bases. The reference omits the sigmoid factor for poly/Fourier
  (`sim_plain.py:224-230` uses raw basis values) — reproduce that with
  ``chain='reference'``.
- Like the reference, the estimator is NOT scaled by T (the U(0,T) sampling
  Jacobian is absorbed into the learning rate).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..dynamics.propagator import evolve
from ..measure import (Measurement, exact_expectation, measurement_noise,
                       stochastic_measure)
from ..ops.cpx import CP
from ..pulses.basis import basis_matrix


def envelope_sensitivity(envelope, coeff: jnp.ndarray, s, T,
                         chain: str = "exact") -> jnp.ndarray:
    """dD_k(s)/dc_kj for the simple envelope model, closed form.

    D_k = (2 sigmoid(A_k) - 1) omega_k, A_k = sum_j c_kj phi_j(s)
    → dD_k/dc_kj = 2 sigmoid'(A_k) omega_k phi_j(s).

    chain='reference' reproduces `sim_plain.py:224-230`: poly/fourier get raw
    phi_j(s) (no sigmoid factor), legendre/bspline get the exact chain.
    """
    phi = basis_matrix(envelope.basis, envelope.n_basis,
                       jnp.asarray(s), T)  # [n_basis]
    a = coeff @ phi  # [n_controls]
    sig = jax.nn.sigmoid(a)
    omg = jnp.asarray(envelope.omegas, dtype=a.dtype)
    factor = 2.0 * sig * (1.0 - sig) * omg  # [n_controls]
    exact = factor[:, None] * phi[None, :]
    if chain == "exact":
        return exact
    if chain == "reference":
        if envelope.basis in ("legendre", "bspline"):
            return exact
        return jnp.broadcast_to(phi[None, :], coeff.shape)
    raise ValueError(f"unknown chain mode {chain!r}")


def envelope_jacobian(envelope, coeff: jnp.ndarray, s, T) -> jnp.ndarray:
    """du_k(s)/dcoeff for ANY envelope model, by autodiff.

    Returns [n_controls, *coeff.shape]. The closed form above only covers
    the simple model (each control owns disjoint coefficient rows); the
    carrier/channel model shares coefficient rows across channels, so the
    full Jacobian is needed. Cost: one reverse pass per control of a
    scalar-output envelope evaluation — negligible next to the evolutions.
    """
    def u_at_s(c):
        return envelope.amplitudes(c, jnp.asarray(s)[None], T)[:, 0]

    return jax.jacrev(u_at_s)(coeff)


@functools.partial(
    jax.jit,
    static_argnames=("envelope", "T", "n_steps", "backend", "r",
                     "coeff_sign", "chain", "sampling", "noisy", "per_pauli",
                     "t_jacobian", "precision", "t_sample"))
def mc_energy_grad(
    ham,
    envelope,
    measurement: Measurement,
    coeff: jnp.ndarray,
    psi0: jnp.ndarray,
    T: float,
    key: jax.Array,
    n_steps: int,
    backend: str = "auto",
    r: float = 0.5,
    coeff_sign: float = 1.0,
    chain: str = "exact",
    sampling: bool = False,
    noisy: bool = False,
    per_pauli: int = 100,
    t_jacobian: bool = False,
    s: jnp.ndarray | None = None,
    precision: str = "full",
    t_sample: str = "left",
) -> jnp.ndarray:
    """One MC sample of the stochastic gradient (matches the reference's
    one-sample-per-step usage, `sim_plain.py:290`).

    ``coeff_sign=-1.0`` is the fidelity-training mode (`sim_plain.py:461`).
    ``t_jacobian=True`` multiplies by the U(0,T) sampling Jacobian T, making
    the estimator the true gradient in expectation (the reference absorbs
    the 1/T into the learning rate, `sim_plain.py:167,220`). ``s`` overrides
    the internal uniform split-time draw (a traced scalar in [0, T]) — the
    hook for antithetic/stratified sampling (:func:`mc_energy_grad_batch`).
    Returns grad with ``coeff``'s shape.
    """
    k_s, k_meas = jax.random.split(key)
    if s is None:
        s = jax.random.uniform(k_s, dtype=jnp.result_type(float)) * T

    simple_model = hasattr(envelope, "omegas")
    if simple_model:
        dDdc = envelope_sensitivity(envelope, coeff, s, T, chain)
    else:
        # channel/carrier model: full Jacobian [n_controls, *coeff.shape]
        dDdc = envelope_jacobian(envelope, coeff, s, T)

    # --- evolve to the sampled split time ------------------------------
    phi = evolve(ham, envelope, coeff, psi0, 0.0, s, horizon=T, precision=precision,
                 n_steps=n_steps, backend=backend, dt_bound=T / n_steps,
                 t_sample=t_sample)

    # --- matrix-free perturbation gates (CP real-pair algebra) ----------
    # H_k phi for all controls k: [n_Hs, d]
    if ham.is_structured_only:
        # structure-aware application — no dense H_k exists (>13 qubits)
        from ..dynamics.product import apply_structured_terms
        hphi_re, hphi_im = apply_structured_terms(ham, phi)
    else:
        hphi_re = jnp.einsum("kij,j->ki", ham.Hs.re, phi.re, precision=jax.lax.Precision.HIGHEST) \
            - jnp.einsum("kij,j->ki", ham.Hs.im, phi.im, precision=jax.lax.Precision.HIGHEST)
        hphi_im = jnp.einsum("kij,j->ki", ham.Hs.re, phi.im, precision=jax.lax.Precision.HIGHEST) \
            + jnp.einsum("kij,j->ki", ham.Hs.im, phi.re, precision=jax.lax.Precision.HIGHEST)
    scale = 1.0 / jnp.sqrt(1.0 + r * r)
    # phi ± r * i * (H_k phi); i*(a+ib) = -b + ia
    branch_p = CP((phi.re[None, :] - r * hphi_im) * scale,
                  (phi.im[None, :] + r * hphi_re) * scale)
    branch_m = CP((phi.re[None, :] + r * hphi_im) * scale,
                  (phi.im[None, :] - r * hphi_re) * scale)
    branches = CP(jnp.concatenate([branch_p.re, branch_m.re], axis=0),
                  jnp.concatenate([branch_p.im, branch_m.im], axis=0))

    # --- one batched evolution s → T ------------------------------------
    kets = evolve(ham, envelope, coeff, branches, s, T, horizon=T, precision=precision,
                  n_steps=n_steps, backend=backend, dt_bound=T / n_steps,
                  t_sample=t_sample)

    # --- measurement -----------------------------------------------------
    if sampling:
        from ..measure import (DiagonalTermSet, sampled_target_prob,
                               stochastic_measure_diag)
        if measurement.target is not None:
            k_shot, k_noise = jax.random.split(k_meas)
            ps = sampled_target_prob(measurement.target, kets, k_shot,
                                     per_pauli)
        elif measurement.strings is not None:
            from ..measure import stochastic_measure_strings
            k_shot, k_noise = jax.random.split(k_meas)
            ps = stochastic_measure_strings(measurement.strings, kets,
                                            k_shot, per_pauli)
        else:
            sampler = stochastic_measure_diag \
                if isinstance(measurement.terms, DiagonalTermSet) \
                else stochastic_measure
            keys = jax.random.split(k_meas, branches.shape[0] + 1)
            ps = jax.vmap(lambda psi, kk: sampler(
                measurement.terms, psi, kk, per_pauli))(kets, keys[:-1])
            k_noise = keys[-1]
    elif measurement.diag is not None:
        from ..ops import cpx as _cpx
        ps = jnp.sum(_cpx.abs2(kets) * measurement.diag, axis=-1)
        k_noise = k_meas
    elif measurement.target is not None:
        from ..measure import target_overlap_prob
        ps = target_overlap_prob(measurement.target, kets)
        k_noise = k_meas
    elif measurement.strings is not None:
        ps = measurement.strings.expectation(kets)
        k_noise = k_meas
    else:
        ps = exact_expectation(measurement.matrix, kets)  # [2 n_Hs]
        k_noise = k_meas
    if noisy:
        nkeys = jax.random.split(k_noise, ps.shape[0])
        ps = jax.vmap(measurement_noise)(ps, nkeys)

    n_hs = ham.n_controls
    ps_p, ps_m = ps[:n_hs], ps[n_hs:]
    factor = coeff_sign * (1.0 + r * r) / (2.0 * r)
    if t_jacobian:
        factor = factor * T
    ps_k = factor * (ps_m - ps_p)  # [n_Hs] real

    if simple_model:
        return ps_k[:, None] * dDdc
    # channel model: contract the control axis of the full Jacobian
    return jnp.tensordot(ps_k.astype(dDdc.dtype), dDdc, axes=1)


def _mc_sample_mode(ham, mode: str) -> str:
    """'vmap' maps the sample axis onto one wide program; 'map' runs
    samples as sequential lax.map iterations of ONE traced body. The
    packed/mega fused kernels (18+ qubits) cannot be vmapped — Pallas
    auto-batching would need non-trivial blocks on ANY-memory-space
    state buffers (chip-measured failure, tpu_tests::
    test_mc_estimator_18q_on_chip) and one 18q+ sample already fills the
    chip, so 'auto' picks 'map' exactly where the fused router does."""
    if mode != "auto":
        return mode
    from ..dynamics.product import _PACKED_MIN_QUBITS
    return "map" if ham.n_qubits >= _PACKED_MIN_QUBITS else "vmap"


def mc_energy_grad_batch(ham, envelope, measurement, coeff, psi0, T, key,
                         n_steps, n_samples: int, strategy: str = "iid",
                         sample_mode: str = "auto", **kw) -> jnp.ndarray:
    """Average of ``n_samples`` MC gradient samples (the variance-reduction
    scale-out the reference lacks).

    The only randomness in the noiseless estimator is the split time
    ``s ~ U(0, T)``; its sampling ``strategy`` controls the variance at
    FIXED cost (same number of evolutions):

    - ``'iid'``: independent uniforms (reference semantics);
    - ``'antithetic'``: pairs (s, T - s) — exact cancellation of the
      odd-about-T/2 component of the integrand;
    - ``'stratified'``: one uniform per equal sub-interval
      (s_i = (i + u_i) T / N) — kills the between-strata variance, leaving
      only the within-stratum wiggle. Unbiased in all three cases.

    ``sample_mode``: 'vmap' | 'map' | 'auto' — see :func:`_mc_sample_mode`
    (18+ qubit fused paths need 'map').
    """
    keys = jax.random.split(key, n_samples)
    one = lambda k, s: mc_energy_grad(  # noqa: E731
        ham, envelope, measurement, coeff, psi0, T, k, n_steps, s=s, **kw)
    if _mc_sample_mode(ham, sample_mode) == "vmap":
        over = jax.vmap(one)
    else:
        over = lambda ks, ss: jax.lax.map(  # noqa: E731
            lambda xs: one(*xs), (ks, ss))
    ftype = jnp.result_type(float)
    if strategy == "iid":
        u = jax.vmap(lambda k: jax.random.uniform(
            jax.random.split(k)[0], dtype=ftype))(keys)
        ss = u * T
    elif strategy == "antithetic":
        if n_samples % 2:
            raise ValueError("antithetic sampling needs even n_samples")
        u = jax.random.uniform(key, (n_samples // 2,), dtype=ftype)
        ss = jnp.concatenate([u, 1.0 - u]) * T
    elif strategy == "stratified":
        u = jax.random.uniform(key, (n_samples,), dtype=ftype)
        ss = (jnp.arange(n_samples, dtype=ftype) + u) * (T / n_samples)
    else:
        raise ValueError(f"unknown sampling strategy {strategy!r}")
    return over(keys, ss).mean(axis=0)
