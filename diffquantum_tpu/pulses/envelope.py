"""Control-envelope models: spectral coefficients → drive amplitudes u_k(t).

Two pulse models, matching the reference's two disconnected backends
(`SURVEY.md` §1 "Important structural fact"):

- :class:`SimpleEnvelope` — the Python model (`/root/reference/
  sim_plain.py:73-99`): one real envelope per control,
  ``u_k(t) = (2 sigmoid(sum_j c_kj phi_j(t)) - 1) * omega_k`` — a bounded
  drive in ``[-omega_k, +omega_k]``.

- :class:`ChannelEnvelope` — the C++ IBM-pulse-like channel model
  (`/root/reference/diffqc.cc:95-135`): each control h owns a set of
  *channels*; a channel has drive strength ``omega``, carrier frequency
  ``w`` and coefficient row ``idx``; with two quadratures
  ``A = sum_j vv[0,idx,j] phi_j(t)``, ``B = sum_j vv[1,idx,j] phi_j(t)``,
  ``N = sqrt(A^2+B^2)``, the channel contributes
  ``omega * (2 expit(N) - 1)/N * (cos(w t) A + sin(w t) B)``
  with a branchless N→0 guard (`diffqc.cc:127-133`).

Both are *array programs*: given a time grid ``ts`` of length n_t they return
the full ``u[n_controls, n_t]`` amplitude table in one shot (basis matmul +
fused elementwise), instead of the reference's per-step Python closure calls.
Both are differentiable w.r.t. the coefficients — `jax.grad` flows through.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .basis import basis_matrix, canonical_kind

_EXPIT_CUTOFF = 32.0  # diffqc.cc:75-80 clamps expit to exactly 0/1 beyond ±32


def clamped_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid with hard saturation beyond |x|=32 (`diffqc.cc:75-80`)."""
    s = jax.nn.sigmoid(x)
    s = jnp.where(x > _EXPIT_CUTOFF, 1.0, s)
    s = jnp.where(x < -_EXPIT_CUTOFF, 0.0, s)
    return s


@dataclasses.dataclass(frozen=True)
class SimpleEnvelope:
    """Per-control squashed spectral envelope (`sim_plain.py:73-99`).

    Attributes:
        basis: basis kind ('poly' | 'legendre' | 'fourier' | 'bspline').
        n_basis: number of basis functions (coefficient columns).
        omegas: [n_controls] max drive amplitude per control.
    """

    basis: str
    n_basis: int
    omegas: tuple[float, ...]

    def __post_init__(self):
        object.__setattr__(self, "basis", canonical_kind(self.basis))
        object.__setattr__(self, "omegas", tuple(float(w) for w in self.omegas))

    @property
    def n_controls(self) -> int:
        return len(self.omegas)

    @property
    def coeff_shape(self) -> tuple[int, int]:
        return (self.n_controls, self.n_basis)

    def init_coeff(self, key: jax.Array, scale: float = 1e-3,
                   dtype=jnp.float32) -> jnp.ndarray:
        """N(0, scale) init, matching `sim_plain.py:259` (scale=1e-3 for
        energy training) / `sim_plain.py:425` (scale=1 for fidelity)."""
        return scale * jax.random.normal(key, self.coeff_shape, dtype=dtype)

    def raw(self, coeff: jnp.ndarray, ts: jnp.ndarray, T) -> jnp.ndarray:
        """Pre-squash basis expansion A_k(t) = sum_j c_kj phi_j(t).

        coeff: [n_controls, n_basis]; ts: [n_t] → [n_controls, n_t].
        """
        phi = basis_matrix(self.basis, self.n_basis, ts, T)  # [n_t, n_basis]
        # Keep the (select-heavy) basis evaluation OUT of the matmul fusion:
        # on the TPU backend the fused kernel is ~1000x slower (30 ms vs
        # 0.03 ms for this shape). The barrier forces materialization.
        phi = jax.lax.optimization_barrier(phi)
        return jnp.matmul(coeff, phi.T, precision=jax.lax.Precision.HIGHEST)

    def amplitudes(self, coeff: jnp.ndarray, ts: jnp.ndarray, T) -> jnp.ndarray:
        """u[n_controls, n_t] drive amplitude table (`sim_plain.py:96-98`)."""
        a = self.raw(coeff, ts, T)
        omg = jnp.asarray(self.omegas, dtype=a.dtype)
        return (2.0 * clamped_sigmoid(a) - 1.0) * omg[:, None]


@dataclasses.dataclass(frozen=True)
class Channel:
    """One drive channel of the carrier model (`diffqc.cc:108-111`).

    The reference stores channels as raw float rows ``[·, omega, w, idx]``;
    we name the fields. ``control`` is the index of the Hamiltonian H_h this
    channel drives (the reference's outer list position, `diffqc.cc:103`).
    """

    control: int
    omega: float
    w: float  # carrier angular frequency
    idx: int  # coefficient row in vv[quadrature, idx, basis]


@dataclasses.dataclass(frozen=True)
class ChannelEnvelope:
    """Carrier-modulated two-quadrature pulse model (`diffqc.cc:95-135`).

    Coefficients ``vv`` have shape [2, n_idx, n_basis] (quadrature, row,
    basis), exactly the reference's ``vv`` layout (`diffqc.cc:97,119-124`).
    ``func_type`` 0 selects Legendre on 2t/T-1, 1 selects the B-spline bump
    on t/T (`diffqc.cc:113-125`).
    """

    channels: tuple[Channel, ...]
    n_controls: int
    n_basis: int
    n_idx: int
    func_type: int = 0  # 0: legendre, 1: bspline (diffqc.cc:25)

    @classmethod
    def from_rows(cls, rows_per_control: Sequence[Sequence[Sequence[float]]],
                  n_basis: int, func_type: int = 0) -> "ChannelEnvelope":
        """Build from the reference's nested-list channel table
        (``channels[h][i_c] = [_, omega, w, idx]``, `diffqc.cc:103-111`)."""
        chans = []
        n_idx = 0
        for h, rows in enumerate(rows_per_control):
            for row in rows:
                idx = int(round(row[3]))
                chans.append(Channel(control=h, omega=float(row[1]),
                                     w=float(row[2]), idx=idx))
                n_idx = max(n_idx, idx + 1)
        return cls(channels=tuple(chans), n_controls=len(rows_per_control),
                   n_basis=n_basis, n_idx=n_idx, func_type=int(func_type))

    @property
    def coeff_shape(self) -> tuple[int, int, int]:
        return (2, self.n_idx, self.n_basis)

    def init_coeff(self, key: jax.Array, scale: float = 1e-3,
                   dtype=jnp.float32) -> jnp.ndarray:
        return scale * jax.random.normal(key, self.coeff_shape, dtype=dtype)

    def amplitudes(self, vv: jnp.ndarray, ts: jnp.ndarray, T) -> jnp.ndarray:
        """u[n_controls, n_t] with per-channel carrier modulation.

        Vectorized over all channels at once; per-control sums are a
        segment-sum (the reference loops channels serially per trotter step,
        `diffqc.cc:103-133`).
        """
        kind = "legendre" if self.func_type == 0 else "bspline"
        ts = jnp.asarray(ts)
        phi = basis_matrix(kind, self.n_basis, ts, T)  # [n_t, n_basis]
        phi = jax.lax.optimization_barrier(phi)  # see SimpleEnvelope.raw

        ctrl = np.array([c.control for c in self.channels], dtype=np.int32)
        omega = jnp.array([c.omega for c in self.channels], dtype=phi.dtype)
        w = jnp.array([c.w for c in self.channels], dtype=phi.dtype)
        idx = np.array([c.idx for c in self.channels], dtype=np.int32)

        hp = jax.lax.Precision.HIGHEST
        A = jnp.matmul(vv[0][idx], phi.T, precision=hp)  # [n_chan, n_t]
        B = jnp.matmul(vv[1][idx], phi.T, precision=hp)
        N = jnp.sqrt(A * A + B * B)
        small = N < 1e-6  # diffqc.cc:128
        safe_N = jnp.where(small, 1.0, N)
        carrier = jnp.cos(w[:, None] * ts[None, :]) * A \
            + jnp.sin(w[:, None] * ts[None, :]) * B
        contrib = omega[:, None] * (2.0 * clamped_sigmoid(N) - 1.0) / safe_N * carrier
        contrib = jnp.where(small, 0.0, contrib)
        return jax.ops.segment_sum(contrib, ctrl, num_segments=self.n_controls)
