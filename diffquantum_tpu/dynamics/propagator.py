"""Time-ordered propagator: psi(T) = Prod_k exp(-i dt H(t_k)) psi(T0).

TPU-native rebuild of both reference propagators — the Python
``SimulatorPlain.trotter`` (`/root/reference/sim_plain.py:119-153`) and the
C++ ``trotter`` (`/root/reference/diffqc.cc:173-205`). The math is identical
(piecewise-constant H on a left-endpoint grid, one dense matrix exponential
per step); the *shape* is TPU-first:

- the control envelopes are evaluated for the whole grid in one basis matmul
  (no per-step Python closures — `sim_plain.py:140` evaluated u_i(t) one
  scalar at a time);
- the step loop is a ``jax.lax.scan`` (one compiled program, no retrace per
  step);
- complex state/operators are real pairs (:class:`~..ops.cpx.CP`) — TPU has
  no native complex support — and each step applies ``exp(-i dt H_t)``
  either as a dense solve-free Taylor scaling-and-squaring expm (small d) or
  directly to the (batched) state via Taylor matvecs (large d / batched
  states: [B, d] x [d, d] real matmuls on the MXU);
- the scan body is `jax.checkpoint`-ed so reverse-mode differentiation
  (adjoint gradients) rematerializes steps instead of storing every
  intermediate.

Step-count semantics match the C++ backend: ``n_steps = int(per_step *
(|T - T0| + 1))`` (`diffqc.cc:182`). The Python reference omits the abs()
(`sim_plain.py:123`) — identical for the forward-time segments the demos
use; we keep the C++ (correct) form and document the divergence.

Both backends evaluate envelopes at the *left* endpoint ``t_k = T0 + k dt``
and advance ``t += dt`` after each step (`sim_plain.py:134-150`,
`diffqc.cc:184-199`); we reproduce that exactly.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import cpx
from ..ops.cpx import CP
from ..ops.expm import cexpm_apply_taylor, cexpm_taylor
from .hamiltonian import ControlledHamiltonian


def reference_n_steps(per_step: int, T0: float, T: float) -> int:
    """`diffqc.cc:182` step-count rule (abs form)."""
    return int(per_step * (abs(T - T0) + 1))


def time_grid(T0, dt, n_steps: int, t_sample: str = "left"):
    """Envelope sample times for the piecewise-constant grid.

    'left' — the reference semantics (`sim_plain.py:134-150`,
    `diffqc.cc:184-199`): u evaluated at the segment start; the evolution is
    globally O(dt) accurate vs the true time-ordered dynamics
    (tests/test_ode_oracle.py).
    'mid' — u evaluated at the segment midpoint: the piecewise-constant
    approximation becomes second order, matching the Strang split, so the
    WHOLE evolution is O(dt^2) vs the true dynamics at identical cost."""
    ts = T0 + dt * jnp.arange(n_steps, dtype=jnp.result_type(float))
    if t_sample == "mid":
        return ts + 0.5 * dt
    if t_sample != "left":
        raise ValueError(f"t_sample must be 'left' or 'mid', "
                         f"got {t_sample!r}")
    return ts


def _amplitude_bound(envelope) -> tuple[float, ...]:
    """Static per-control max |u_k|. SimpleEnvelope is bounded by omegas;
    the channel model by the sum of |omega_c| over a control's channels."""
    if hasattr(envelope, "omegas"):
        return tuple(abs(w) for w in envelope.omegas)
    bounds = [0.0] * envelope.n_controls
    for c in envelope.channels:
        bounds[c.control] += abs(c.omega)
    return tuple(bounds)


@functools.partial(
    jax.jit,
    static_argnames=("envelope", "horizon", "n_steps", "backend", "tol",
                     "dt_bound", "precision", "t_sample"))
def evolve(
    ham: ControlledHamiltonian,
    envelope,
    coeff: jnp.ndarray,
    psi0: CP,
    T0,
    T,
    horizon: float,
    n_steps: int,
    backend: str = "auto",
    tol: float = 1e-7,
    dt_bound: Optional[float] = None,
    precision: str = "full",
    t_sample: str = "left",
) -> CP:
    """Evolve ``psi0`` from ``T0`` to ``T`` under H(t) = H0 + sum u_k(t) H_k.

    Args:
        ham: the controlled Hamiltonian (pytree, CP storage).
        envelope: pulse model (SimpleEnvelope / ChannelEnvelope) — static.
        coeff: spectral coefficients (trainable; envelope.coeff_shape).
        psi0: state CP [d] or batch CP [..., d].
        T0, T: segment endpoints. May be traced scalars (the MC estimator
            evolves to a *sampled* time s).
        horizon: static total pulse duration for basis normalization (the
            reference's ``self.T`` / ``g_duration``).
        n_steps: static step count (:func:`reference_n_steps` for reference
            semantics).
        backend: 'expm' (dense per-step exponential), 'apply' (Taylor
            expm-times-vector), or 'auto' (apply for d >= 512 or batched
            states, else expm).
        precision: 'full' | 'fast' — in-kernel matmul precision of the
            fused backend (ignored by the other backends; see
            :func:`..dynamics.product.evolve_product_fused`).
        tol: truncation tolerance of the Taylor series.
        dt_bound: static upper bound on |dt| = |T-T0|/n_steps. Required when
            T/T0 are traced; defaults to horizon/n_steps.

    Returns:
        psi(T) as CP with the same shape as psi0.
    """
    if backend == "auto" and ham.is_structured_only:
        from .product import fused_eligible
        on_tpu = jax.default_backend() in ("tpu", "axon")
        backend = "product_fused" if (on_tpu and ham.dtype == jnp.float32
                                      and fused_eligible(ham)) else "product"
    if backend == "product_fused":
        from .product import evolve_product_fused
        return evolve_product_fused(ham, envelope, coeff, psi0, T0, T,
                                    horizon=horizon, n_steps=n_steps,
                                    dt_bound=dt_bound, precision=precision,
                                    t_sample=t_sample)
    if backend == "product":
        from .product import evolve_product
        return evolve_product(ham, envelope, coeff, psi0, T0, T,
                              horizon=horizon, n_steps=n_steps,
                              dt_bound=dt_bound, t_sample=t_sample)
    if ham.is_structured_only:
        raise ValueError(
            f"backend {backend!r} needs dense operators, but this "
            "ControlledHamiltonian is structure-only (create_structured); "
            "use backend='product'/'product_fused' or build with dense=True")

    dt = (T - T0) / n_steps
    ts = time_grid(T0, dt, n_steps, t_sample)
    u = envelope.amplitudes(coeff, ts, horizon)  # [n_controls, n_steps]

    if dt_bound is None:
        dt_bound = float(horizon) / n_steps
    h_bound = ham.norm_bound(_amplitude_bound(envelope))
    a_bound = dt_bound * h_bound  # ||-i dt H(t)||

    d = ham.dim
    batched = psi0.ndim > 1
    if backend == "auto":
        backend = "apply" if (d >= 512 or batched) else "expm"

    psi0 = psi0.astype(ham.dtype)
    u_steps = u.T.astype(ham.dtype)  # [n_steps, n_controls] — scan xs
    # keep the scan carry dtype stable: a traced f64 dt must not promote an
    # f32 state (x64 mode computes the time grid in f64)
    dt_c = jnp.asarray(dt, dtype=ham.dtype)

    if backend == "expm":
        @jax.checkpoint
        def step(psi, u_t):
            h_t = ham.at(u_t)
            e = cexpm_taylor(cpx.mulmi(cpx.rscale(h_t, dt_c)), a_bound, tol)
            return cpx.matvec(e, psi), None

        psi, _ = jax.lax.scan(step, psi0, u_steps)
        return psi

    if backend == "apply":
        flat = psi0.reshape(-1, d)

        @jax.checkpoint
        def step(psi, u_t):
            h_t = ham.at(u_t)
            # exp(z H) psi with z = -i dt  →  (z_re, z_im) = (0, -dt)
            return cexpm_apply_taylor(h_t, psi, jnp.zeros_like(dt_c), -dt_c,
                                      a_bound, tol), None

        psi, _ = jax.lax.scan(step, flat, u_steps)
        return psi.reshape(*psi0.shape)

    raise ValueError(f"unknown backend {backend!r}")


@functools.partial(
    jax.jit,
    static_argnames=("envelope", "horizon", "n_steps", "backend", "tol"))
def evolve_trajectory(
    ham: ControlledHamiltonian,
    envelope,
    coeff: jnp.ndarray,
    psi0: CP,
    T0,
    T,
    horizon: float,
    n_steps: int,
    backend: str = "auto",
    tol: float = 1e-7,
) -> CP:
    """Like :func:`evolve` but returns the state at EVERY grid point —
    CP [n_steps + 1, ..., d] including psi(T0) — the trajectory semantics of
    the reference's ``qp.mesolve(H, psi0, ts).states``
    (`/root/reference/sim_plain.py:330,386,448`)."""
    dt = (T - T0) / n_steps
    ts = T0 + dt * jnp.arange(n_steps, dtype=jnp.result_type(float))
    u = envelope.amplitudes(coeff, ts, horizon)

    dt_bound = float(horizon) / n_steps
    a_bound = dt_bound * ham.norm_bound(_amplitude_bound(envelope))
    d = ham.dim
    psi0 = psi0.astype(ham.dtype)
    u_steps = u.T.astype(ham.dtype)
    dt_c = jnp.asarray(dt, dtype=ham.dtype)

    use_expm = (backend == "expm" or
                (backend == "auto" and d < 512 and psi0.ndim == 1
                 and not ham.is_structured_only))

    def step(psi, u_t):
        if ham.is_structured_only:
            raise ValueError("evolve_trajectory needs dense operators; use "
                             "evolve_product per segment for structured H")
        h_t = ham.at(u_t)
        if use_expm:
            e = cexpm_taylor(cpx.mulmi(cpx.rscale(h_t, dt_c)), a_bound, tol)
            out = cpx.matvec(e, psi)
        else:
            out = cexpm_apply_taylor(h_t, psi, jnp.zeros_like(dt_c), -dt_c,
                                     a_bound, tol)
        return out, out

    _, traj = jax.lax.scan(step, psi0, u_steps)
    return CP(jnp.concatenate([psi0.re[None], traj.re], axis=0),
              jnp.concatenate([psi0.im[None], traj.im], axis=0))


def step_doubling_error(ham, envelope, coeff, psi0: CP, T: float,
                        n_steps: int, backend: str = "auto",
                        t_sample: str = "left", **kw) -> float:
    """Richardson-style a-posteriori error estimate for the trotter grid:
    ``|| psi(n_steps) - psi(2 n_steps) ||``. For a method of global order p
    this underestimates the true error by the factor (1 - 2^{-p}) — i.e.
    within 2x of it — with NO oracle required (validated against the
    adaptive-ODE oracle in tests/test_ode_oracle.py)."""
    import numpy as _np
    a = evolve(ham, envelope, coeff, psi0, 0.0, T, horizon=float(T),
               n_steps=n_steps, backend=backend, t_sample=t_sample, **kw)
    b = evolve(ham, envelope, coeff, psi0, 0.0, T, horizon=float(T),
               n_steps=2 * n_steps, backend=backend, t_sample=t_sample, **kw)
    d2 = _np.asarray(cpx.norm2(CP(a.re - b.re, a.im - b.im)))
    return float(_np.sqrt(_np.max(d2)))


def calibrate_n_steps(ham, envelope, coeff, psi0: CP, T: float,
                      tol: float = 1e-4, n_start: int = 10,
                      n_max: int = 100_000, backend: str = "auto",
                      t_sample: str = "left", **kw) -> int:
    """Smallest power-of-two refinement of ``n_start`` whose step-doubling
    error estimate is below ``tol``. Host loop (each probe is one jitted
    evolution pair); the reference exposes only the blind ``per_step`` knob
    (`/root/reference/sim_plain.py:123`) with no way to know the
    discretization error."""
    n = n_start
    while n <= n_max:
        if step_doubling_error(ham, envelope, coeff, psi0, T, n,
                               backend=backend, t_sample=t_sample,
                               **kw) < tol:
            return n
        n *= 2
    raise ValueError(f"tol={tol} not reached by n_steps={n_max}; "
                     "consider t_sample='mid' (second order) or a looser "
                     "tolerance")


def trotter(ham: ControlledHamiltonian, envelope, coeff, psi0: CP, T0: float,
            T: float, horizon: Optional[float] = None, per_step: int = 10,
            **kw) -> CP:
    """Reference-signature wrapper: step count per `diffqc.cc:182`.

    ``horizon`` defaults to T (segment == whole pulse, the common case)."""
    n_steps = reference_n_steps(per_step, T0, T)
    return evolve(ham, envelope, coeff, psi0, T0, T,
                  horizon=float(T if horizon is None else horizon),
                  n_steps=n_steps, **kw)
