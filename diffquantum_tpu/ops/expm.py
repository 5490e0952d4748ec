"""Matrix exponential kernels on the real-pair (CP) representation.

This replaces the reference's two exponentiation engines — Eigen's dense Padé
``.exp()`` in the C++ core (`/root/reference/diffqc.cc:157,198`) and
``scipy.linalg.expm`` in the Python path (`/root/reference/sim_plain.py:145`)
— with TPU-shaped alternatives operating on :class:`~.cpx.CP` real pairs
(native complex is unsupported on the TPU backend; see ops/cpx.py):

1. :func:`cexpm_taylor` — scaling-and-squaring with a truncated Taylor
   series. Solve-free: nothing but real batched matmuls (MXU). For the
   anti-Hermitian generators ``A = -i dt H`` arising here, the spectral norm
   is bounded in advance (``dt * ||H||``), so scaling count and order are
   chosen *statically* — no data-dependent control flow under jit.

2. :func:`cexpm_pade13` — classic Padé(13) with the linear solve done on the
   real 2d x 2d embedding ``[[re, -im], [im, re]]``. Cross-check / generic
   path.

3. :func:`cexpm_apply_taylor` — applies ``exp(z H)`` directly to a (batch
   of) state(s) without forming the exponential: sub-stepped truncated
   Taylor matvecs. With a batch of B states each Taylor term is a
   ``[B, d] x [d, d]`` real matmul — the MXU sweet spot — and memory drops
   from O(d^2) to O(dB) per step. This is the scalable engine the reference
   only gestured at (commented-out ``expm_multiply``,
   `sim_plain.py:139,147`).

All functions are jit/vmap/grad-compatible.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from . import cpx
from .cpx import CP

_FACTORIALS = [math.factorial(k) for k in range(35)]


def taylor_params(norm_bound: float, tol: float = 1e-7,
                  max_order: int = 24) -> tuple[int, int]:
    """Static (order, n_squarings) so the truncated-Taylor error of
    ``exp(A)`` with ``||A|| <= norm_bound`` stays below ``tol``.

    Picks the smallest squaring count s with scaled norm theta <= 1.0, then
    the smallest order m with theta^(m+1)/(m+1)! <= tol.
    """
    norm_bound = float(max(norm_bound, 1e-30))
    s = max(0, int(math.ceil(math.log2(norm_bound))))  # theta <= 1
    theta = norm_bound / (2.0**s)
    for m in range(4, max_order + 1):
        if theta ** (m + 1) / _FACTORIALS[m + 1] <= tol:
            return m, s
    return max_order, s


def cexpm_taylor(a: CP, norm_bound: float, tol: float = 1e-7) -> CP:
    """Batched ``exp(a)`` by scaling-and-squaring + Taylor (solve-free).

    a: CP [..., d, d]; ``norm_bound`` is a static upper bound on the
    spectral norm of every matrix in the batch.
    """
    order, s = taylor_params(norm_bound, tol)
    a = cpx.rscale(a, 1.0 / (2.0**s))
    d = a.shape[-1]
    eye_re = jnp.broadcast_to(jnp.eye(d, dtype=a.dtype), a.shape)
    zero = jnp.zeros_like(eye_re)
    # Horner: exp(a) ≈ I + a(I + a/2(I + a/3(...)))
    acc = CP(eye_re + a.re / order, zero + a.im / order)
    for k in range(order - 1, 0, -1):
        prod = cpx.matmul(a, acc)
        acc = CP(eye_re + prod.re / k, zero + prod.im / k)
    for _ in range(s):
        acc = cpx.matmul(acc, acc)
    return acc


# Padé(13) coefficients (Higham 2005).
_PADE13_B = np.array([
    64764752532480000.0, 32382376266240000.0, 7771770303897600.0,
    1187353796428800.0, 129060195264000.0, 10559470521600.0,
    670442572800.0, 33522128640.0, 1323241920.0, 40840800.0,
    960960.0, 16380.0, 182.0, 1.0,
])
_PADE13_THETA = 5.371920351148152


def _real_embed(a: CP) -> jnp.ndarray:
    """[[re, -im], [im, re]] block matrix (the regular representation)."""
    top = jnp.concatenate([a.re, -a.im], axis=-1)
    bot = jnp.concatenate([a.im, a.re], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _real_unembed(m: jnp.ndarray) -> CP:
    d = m.shape[-1] // 2
    return CP(m[..., :d, :d], m[..., d:, :d])


def cexpm_pade13(a: CP, norm_bound: float) -> CP:
    """Padé(13) scaling-and-squaring; same algorithm family as Eigen's
    ``MatrixBase::exp`` (`diffqc.cc:198`) / scipy (`sim_plain.py:145`), with
    a static scaling count and the solve on the real embedding."""
    s = max(0, int(math.ceil(math.log2(max(norm_bound, 1e-30) / _PADE13_THETA))))
    a = cpx.rscale(a, 1.0 / (2.0**s))
    d = a.shape[-1]
    b = _PADE13_B
    ident = cpx.eye(d, dtype=a.dtype)
    ident = CP(jnp.broadcast_to(ident.re, a.re.shape),
               jnp.broadcast_to(ident.im, a.im.shape))
    a2 = cpx.matmul(a, a)
    a4 = cpx.matmul(a2, a2)
    a6 = cpx.matmul(a2, a4)

    def lin(c6, c4, c2, c0):
        return CP(c6 * a6.re + c4 * a4.re + c2 * a2.re + c0 * ident.re,
                  c6 * a6.im + c4 * a4.im + c2 * a2.im + c0 * ident.im)

    inner = CP(b[13] * a6.re + b[11] * a4.re + b[9] * a2.re,
               b[13] * a6.im + b[11] * a4.im + b[9] * a2.im)
    u = cpx.matmul(a, cpx.add(cpx.matmul(a6, inner),
                              lin(b[7], b[5], b[3], b[1])))
    v = cpx.add(cpx.matmul(a6, CP(b[12] * a6.re + b[10] * a4.re + b[8] * a2.re,
                                  b[12] * a6.im + b[10] * a4.im + b[8] * a2.im)),
                lin(b[6], b[4], b[2], b[0]))
    lhs = _real_embed(cpx.sub(v, u))
    rhs = _real_embed(cpx.add(v, u))
    r = _real_unembed(jnp.linalg.solve(lhs, rhs))
    for _ in range(s):
        r = cpx.matmul(r, r)
    return r


def cexpm_apply_taylor(h: CP, psi: CP, z_re, z_im, norm_bound: float,
                       tol: float = 1e-7, max_order: int = 24) -> CP:
    """Apply ``exp((z_re + i z_im) h) @ psi`` via truncated-Taylor matvecs.

    h: CP [d, d]; psi: CP [..., d] (leading batch dims); (z_re, z_im): real
    scalars, may be traced — ``|z| * ||h|| <= norm_bound`` must hold and is
    used statically to pick substeps and order. Cost per substep: ``order``
    batched real matvecs/matmuls.
    """
    order, s = taylor_params(norm_bound, tol, max_order)
    r = 2**s
    zr_re, zr_im = z_re / r, z_im / r

    def substep(p, _):
        term = p
        acc = p
        for k in range(1, order + 1):
            term = cpx.matvec(h, term)
            term = cpx.cscale(term, zr_re / k, zr_im / k)
            acc = cpx.add(acc, term)
        return acc, None

    out, _ = jax.lax.scan(substep, psi, None, length=r)
    return out
