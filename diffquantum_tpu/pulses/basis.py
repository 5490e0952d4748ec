"""Spectral function bases for pulse parameterization — as array programs.

The reference evaluates basis functions pointwise inside Python closures in
the trotter hot loop (`/root/reference/sim_plain.py:73-99` for the Python
model; `/root/reference/diffqc.cc:95-135` for the C++ channel model). On TPU
that is the wrong shape: we instead evaluate the whole basis on the full time
grid at once, producing a matrix ``Phi[n_t, n_basis]`` so the control
envelope becomes a single matmul ``coeff @ Phi.T`` that XLA fuses with the
squashing nonlinearity.

Bases (semantics matched 1:1 to the reference):

- ``poly``     : ``phi_j(t) = (t - 0.5)**j``                (`sim_plain.py:87`)
- ``legendre`` : ``phi_j(t) = P_j(2 t / T - 1)``            (`sim_plain.py:89`,
                  `diffqc.cc:117`) — computed by the Bonnet recurrence (TPU
                  friendly, no scipy), valid for traced ``t``.
- ``fourier``  : first ``n_basis//2`` coefficients are cosines
                 ``cos(2 pi j t)``, the second half sines (`sim_plain.py:91-92`;
                 note the reference does NOT rescale t by T here).
- ``bspline``  : cardinal quadratic bump on normalized time ``t/T``
                 (`sim_plain.py:52-70`, `diffqc.cc:82-93`): with
                 ``tau = 1/(n_basis-2)``, center ``tau*(b-1.5)``, support
                 ``±1.5 tau``, value ``(t-l)(t-r)/-(1.5 tau)^2`` (peak 1).

All functions accept traced time arrays (needed by the MC gradient
estimator, which evaluates the basis at a random sampled time ``s``).
"""
from __future__ import annotations

import jax.numpy as jnp

BASIS_KINDS = ("poly", "legendre", "fourier", "bspline")

# Reference naming (sim_plain.py uses capitalized names) → canonical.
_ALIASES = {
    "poly": "poly",
    "legendre": "legendre",
    "fourier": "fourier",
    "bspline": "bspline",
}


def canonical_kind(kind: str) -> str:
    k = kind.lower()
    if k not in _ALIASES:
        raise ValueError(f"unknown basis kind {kind!r}; expected one of {BASIS_KINDS}")
    return _ALIASES[k]


def legendre_matrix(x: jnp.ndarray, n_basis: int) -> jnp.ndarray:
    """``P_j(x)`` for j = 0..n_basis-1 via Bonnet's recurrence.

    x: [...] → returns [..., n_basis]. Differentiable and trace-safe.
    """
    x = jnp.asarray(x)
    cols = [jnp.ones_like(x)]
    if n_basis > 1:
        cols.append(x)
    for j in range(2, n_basis):
        # (j) P_j = (2j-1) x P_{j-1} - (j-1) P_{j-2}
        cols.append(((2 * j - 1) * x * cols[-1] - (j - 1) * cols[-2]) / j)
    return jnp.stack(cols[:n_basis], axis=-1)


def bspline_matrix(tn: jnp.ndarray, n_basis: int) -> jnp.ndarray:
    """Quadratic bump basis on normalized time ``tn = t/T`` (branchless).

    Matches `diffqc.cc:82-93` / `sim_plain.py:52-70` exactly (open interval
    support: value 0 at and outside the endpoints).
    """
    if n_basis <= 2:
        raise ValueError("bspline basis needs n_basis >= 3")
    tn = jnp.asarray(tn)[..., None]  # [..., 1]
    tau = 1.0 / (n_basis - 2.0)
    b = jnp.arange(n_basis, dtype=tn.dtype)
    center = tau * (b - 1.5)
    left = center - 1.5 * tau
    right = center + 1.5 * tau
    norm = -((1.5 * tau) ** 2)
    val = (tn - left) * (tn - right) / norm
    inside = (tn > left) & (tn < right)
    return jnp.where(inside, val, 0.0)


def poly_matrix(t: jnp.ndarray, n_basis: int) -> jnp.ndarray:
    """``(t - 0.5)**j`` columns (`sim_plain.py:87`)."""
    t = jnp.asarray(t)
    x = t - 0.5
    cols = [jnp.ones_like(x)]
    for _ in range(1, n_basis):
        cols.append(cols[-1] * x)  # iterative products: no 0**0 NaN at t=0.5
    return jnp.stack(cols, axis=-1)


def fourier_matrix(t: jnp.ndarray, n_basis: int) -> jnp.ndarray:
    """[cos(2 pi j t) for j < n | sin(2 pi j t) for j < n], n = n_basis//2.

    If n_basis is odd the trailing column is zero (the reference simply never
    indexes it: `sim_plain.py:84,91-92`).
    """
    t = jnp.asarray(t)[..., None]
    n = n_basis // 2
    j = jnp.arange(n, dtype=t.dtype)
    ang = 2.0 * jnp.pi * j * t
    cols = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
    if cols.shape[-1] < n_basis:
        pad = jnp.zeros(t.shape[:-1] + (n_basis - cols.shape[-1],), dtype=cols.dtype)
        cols = jnp.concatenate([cols, pad], axis=-1)
    return cols


def basis_matrix(kind: str, n_basis: int, t: jnp.ndarray, T) -> jnp.ndarray:
    """Evaluate the basis on (possibly traced) times ``t`` with horizon ``T``.

    Returns ``Phi`` with shape ``t.shape + (n_basis,)``.
    """
    k = canonical_kind(kind)
    t = jnp.asarray(t)
    if k == "poly":
        return poly_matrix(t, n_basis)
    if k == "legendre":
        return legendre_matrix(2.0 * t / T - 1.0, n_basis)
    if k == "fourier":
        return fourier_matrix(t, n_basis)
    return bspline_matrix(t / T, n_basis)
