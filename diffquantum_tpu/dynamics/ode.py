"""Adaptive-ODE forward engine — the reference's ``qp.mesolve`` semantics.

The reference integrates its FD and fidelity forward evolutions with an
adaptive ODE solver under the CONTINUOUS envelope
(`/root/reference/sim_plain.py:330,448` — qutip ``mesolve``), while every
trotter engine here samples the envelope piecewise-constant on a grid.
This module promotes the test-only oracle (tests/test_ode_oracle.py) to a
selectable production engine for small-d, high-accuracy runs: scipy
``solve_ivp`` (DOP853, complex128) on the exact Schrodinger equation with
u(t) evaluated pointwise.

Host-side by design: adaptive step control is data-dependent (unjittable),
and the engine exists for *accuracy baselines* — FD gradients (which need
only forward evaluations, exactly where the reference used mesolve),
trotter-error auditing (`calibrate_n_steps` cross-checks), and parity
studies. The TPU engines remain the production path.
"""
from __future__ import annotations

import numpy as np

from ..ops import cpx
from ..ops.cpx import CP


def evolve_ode(ham, envelope, coeff, psi0: CP, T0: float, T: float,
               horizon: float, rtol: float = 1e-10, atol: float = 1e-10,
               method: str = "DOP853") -> CP:
    """psi(T) under the continuous envelope, adaptive integration.

    ham must carry dense operators (small d); psi0 may have leading batch
    dims (integrated jointly — the RHS is block-diagonal). Returns CP with
    psi0's shape and dtype."""
    from scipy.integrate import solve_ivp

    import jax
    import jax.numpy as jnp

    if ham.is_structured_only:
        raise ValueError("evolve_ode needs dense operators (small-d "
                         "high-accuracy engine); build with dense=True")
    H0 = cpx.to_complex(ham.H0)
    Hs = cpx.to_complex(ham.Hs)          # [n_controls, d, d]
    d = ham.dim
    c64 = jnp.asarray(np.asarray(coeff), jnp.float64)

    amp = jax.jit(lambda t: envelope.amplitudes(
        c64, t.reshape(1), float(horizon))[:, 0])

    lead = psi0.re.shape[:-1]
    y0 = (np.asarray(psi0.re, np.float64)
          + 1j * np.asarray(psi0.im, np.float64)).reshape(-1, d)

    def rhs(t, y):
        u = np.asarray(amp(jnp.asarray(t)))
        H = H0 + np.tensordot(u, Hs, axes=1)
        return (-1j * (y.reshape(-1, d) @ H.T)).reshape(-1)

    sol = solve_ivp(rhs, (float(T0), float(T)), y0.reshape(-1),
                    rtol=rtol, atol=atol, method=method)
    if not sol.success:
        raise RuntimeError(f"solve_ivp failed: {sol.message}")
    yT = sol.y[:, -1].reshape(lead + (d,))
    return CP(jnp.asarray(yT.real, psi0.re.dtype),
              jnp.asarray(yT.imag, psi0.im.dtype))


def fd_energy_grad_ode(ham, envelope, measurement, coeff, psi0: CP,
                       T: float, delta: float = 1e-3,
                       rtol: float = 1e-10) -> np.ndarray:
    """Central-difference gradient with adaptive-ODE forward sims — the
    reference's exact FD recipe (`sim_plain.py:308-353`: 2·n_Hs·n_basis
    mesolve runs per step), for gradient-accuracy baselines. Host-side and
    serial; use the vmapped trotter FD (:mod:`..gradients.fd`) in
    production."""
    import jax.numpy as jnp

    c0 = np.asarray(coeff, np.float64)
    grad = np.zeros_like(c0)

    def energy(c):
        psi = evolve_ode(ham, envelope, jnp.asarray(c), psi0, 0.0, T,
                         horizon=T, rtol=rtol, atol=rtol)
        return float(measurement.expectation(psi))

    it = np.nditer(c0, flags=["multi_index"])
    while not it.finished:
        idx = it.multi_index
        cp_, cm_ = c0.copy(), c0.copy()
        cp_[idx] += delta
        cm_[idx] -= delta
        grad[idx] = (energy(cp_) - energy(cm_)) / (2.0 * delta)
        it.iternext()
    return grad
