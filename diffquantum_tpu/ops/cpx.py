"""Complex arithmetic as real-pair array programs (the TPU representation).

TPU MXU/VPU hardware is real-valued; native ``complex64`` is unsupported on
the deployment backend (host<->device transfer of complex arrays raises
UNIMPLEMENTED, and complex-typed HLO does not compile) and Pallas has no
complex support at all. The entire compute path therefore represents a
complex tensor as a pair of real tensors — a :class:`CP` NamedTuple (a JAX
pytree, so it flows through jit/vmap/grad/scan transparently).

This replaces the complex dense algebra the reference gets from Eigen
(``Eigen::MatrixXcd``, `/root/reference/diffqc.cc:17`) and numpy/scipy
(`/root/reference/sim_plain.py:145-146`).

Matrix products use the 3-multiplication Karatsuba/Gauss form —
``re = t1 - t2, im = t3 - t1 - t2`` with ``t1 = Ar Br``, ``t2 = Ai Bi``,
``t3 = (Ar+Ai)(Br+Bi)`` — 25% fewer MXU FLOPs than the naive 4-mult form.

Convention: a CP of shape [..., d] is a batch of kets; matrices are
[..., d, d]; ``matvec`` applies along the last axis of row-stacked kets.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# TPU matmuls default to bfloat16 passes (eps ~ 8e-3) — catastrophic for
# quantum amplitudes. All CP contractions default to full-f32 precision
# (3-pass bf16 on the MXU); callers may override for throughput.
DEFAULT_PRECISION = jax.lax.Precision.HIGHEST


class CP(NamedTuple):
    """A complex tensor as (real, imag) — automatically a JAX pytree."""

    re: jnp.ndarray
    im: jnp.ndarray

    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    @property
    def dtype(self):
        return self.re.dtype

    def astype(self, dtype) -> "CP":
        return CP(self.re.astype(dtype), self.im.astype(dtype))

    def reshape(self, *shape) -> "CP":
        return CP(self.re.reshape(*shape), self.im.reshape(*shape))

    def __getitem__(self, idx) -> "CP":
        return CP(self.re[idx], self.im[idx])


# ---------------------------------------------------------------------------
# construction / conversion
# ---------------------------------------------------------------------------

def from_complex(a, dtype=jnp.float32) -> CP:
    """Host-side conversion numpy-complex → CP (device arrays are real)."""
    a = np.asarray(a)
    return CP(jnp.asarray(a.real, dtype=dtype), jnp.asarray(a.imag, dtype=dtype))


def to_complex(a: CP) -> np.ndarray:
    """CP → numpy complex (fetches two REAL arrays — transfer-safe)."""
    return np.asarray(a.re) + 1j * np.asarray(a.im)


def zeros(shape, dtype=jnp.float32) -> CP:
    z = jnp.zeros(shape, dtype=dtype)
    return CP(z, z)


def eye(d, dtype=jnp.float32) -> CP:
    return CP(jnp.eye(d, dtype=dtype), jnp.zeros((d, d), dtype=dtype))


# ---------------------------------------------------------------------------
# elementwise algebra
# ---------------------------------------------------------------------------

def add(a: CP, b: CP) -> CP:
    return CP(a.re + b.re, a.im + b.im)


def sub(a: CP, b: CP) -> CP:
    return CP(a.re - b.re, a.im - b.im)


def neg(a: CP) -> CP:
    return CP(-a.re, -a.im)


def conj(a: CP) -> CP:
    return CP(a.re, -a.im)


def mul(a: CP, b: CP) -> CP:
    """Elementwise complex product."""
    return CP(a.re * b.re - a.im * b.im, a.re * b.im + a.im * b.re)


def rscale(a: CP, s) -> CP:
    """Scale by a real scalar/array (broadcasting)."""
    return CP(a.re * s, a.im * s)


def cscale(a: CP, s_re, s_im) -> CP:
    """Scale by a complex scalar given as (re, im) reals (may be traced)."""
    return CP(a.re * s_re - a.im * s_im, a.re * s_im + a.im * s_re)


def muli(a: CP) -> CP:
    """Multiply by +i."""
    return CP(-a.im, a.re)


def mulmi(a: CP) -> CP:
    """Multiply by -i."""
    return CP(a.im, -a.re)


def abs2(a: CP) -> jnp.ndarray:
    return a.re * a.re + a.im * a.im


# ---------------------------------------------------------------------------
# contractions (MXU path)
# ---------------------------------------------------------------------------

def matmul(a: CP, b: CP, precision=DEFAULT_PRECISION) -> CP:
    """Complex matrix product via 3 real matmuls (Karatsuba/Gauss)."""
    t1 = jnp.matmul(a.re, b.re, precision=precision)
    t2 = jnp.matmul(a.im, b.im, precision=precision)
    t3 = jnp.matmul(a.re + a.im, b.re + b.im, precision=precision)
    return CP(t1 - t2, t3 - t1 - t2)


def matvec(m: CP, psi: CP, precision=DEFAULT_PRECISION) -> CP:
    """Apply matrix [d, d] to row-stacked kets [..., d]: (M psi)."""
    # (psi @ M^T) for each of the 3 Gauss products
    t1 = jnp.matmul(psi.re, m.re.T, precision=precision)
    t2 = jnp.matmul(psi.im, m.im.T, precision=precision)
    t3 = jnp.matmul(psi.re + psi.im, (m.re + m.im).T, precision=precision)
    return CP(t1 - t2, t3 - t1 - t2)


def dag(m: CP) -> CP:
    """Conjugate transpose of a matrix CP."""
    return CP(jnp.swapaxes(m.re, -1, -2), -jnp.swapaxes(m.im, -1, -2))


def vdot(a: CP, b: CP) -> CP:
    """<a|b> = sum conj(a) * b over the last axis → CP scalar(s)."""
    re = jnp.sum(a.re * b.re + a.im * b.im, axis=-1)
    im = jnp.sum(a.re * b.im - a.im * b.re, axis=-1)
    return CP(re, im)


def norm2(a: CP) -> jnp.ndarray:
    """||a||^2 along the last axis."""
    return jnp.sum(abs2(a), axis=-1)


def tensordot_weights(w: jnp.ndarray, m: CP,
                      precision=DEFAULT_PRECISION) -> CP:
    """sum_k w[k] * m[k] for real weights w [k] and matrix stack [k, d, d]."""
    return CP(jnp.tensordot(w, m.re, axes=1, precision=precision),
              jnp.tensordot(w, m.im, axes=1, precision=precision))
