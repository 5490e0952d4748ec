"""Drop-in replacement for the reference's ``diffqc`` pybind11 module.

The reference exposes ``set_H / trotter / print_test / complex_test /
test_eigen / __version__`` with module-global system state
(`/root/reference/diffqc.cc:210-228,21-25`). This module reproduces that
exact surface so scripts written against ``import diffqc`` run unchanged:

    from diffquantum_tpu.compat import diffqc
    diffqc.set_H(H0, Hs, channels, duration, func_type)
    psi_T = diffqc.trotter(psi0, T0, T, per_step, vv)

Argument conventions match the reference:
- ``H0``: nested list / array [d][d] complex; ``Hs``: [k][d][d];
- ``channels``: per-control list of channel rows ``[_, omega, w, idx]``
  (`diffqc.cc:108-111` — row position 0 is unused there too);
- ``vv``: [2][n_idx][n_basis] spectral coefficients;
- ``trotter`` returns a plain list of complex amplitudes.

Backed by the native C++ engine (libdiffqc_core.so) when a toolchain is
present, else a numpy/scipy fallback with identical semantics.
"""
from __future__ import annotations

import numpy as np

from ..native import bindings

__version__ = "dev"  # matches diffqc.cc:227

_state = {"sys": None, "fallback": None}


def _flatten_channels(channels):
    rows = []
    for h, chans in enumerate(channels):
        for row in chans:
            rows.append((h, float(row[1]), float(row[2]),
                         int(round(row[3]))))
    return rows


class _NumpyFallback:
    """scipy-based engine with the same semantics (used when no C++
    toolchain is available)."""

    def set_system(self, H0, Hs, rows, duration, func_type):
        self.H0 = np.asarray(H0, dtype=np.complex128)
        self.Hs = [np.asarray(h, dtype=np.complex128) for h in Hs]
        self.rows = rows
        self.duration = float(duration)
        self.func_type = int(func_type)

    def _phi(self, j, n_basis, t):
        if self.func_type == 0:
            # Bonnet recurrence
            x = 2 * t / self.duration - 1
            p0, p1 = 1.0, x
            if j == 0:
                return p0
            for k in range(2, j + 1):
                p0, p1 = p1, ((2 * k - 1) * x * p1 - (k - 1) * p0) / k
            return p1
        tau = 1.0 / (n_basis - 2)
        c = tau * (j - 1.5)
        l, r = c - 1.5 * tau, c + 1.5 * tau
        tn = t / self.duration
        if tn <= l or tn >= r:
            return 0.0
        return (tn - l) * (tn - r) / (-(1.5 * tau) ** 2)

    def trotter(self, psi0, T0, T, per_step, vv):
        import scipy.linalg
        vv = np.asarray(vv, dtype=np.float64)
        n_basis = vv.shape[2]
        n_steps = int(per_step * (abs(T - T0) + 1))
        dt = (T - T0) / n_steps
        t = T0
        psi = np.asarray(psi0, dtype=np.complex128).reshape(-1).copy()
        for _ in range(n_steps):
            H = self.H0.copy()
            for h, Hk in enumerate(self.Hs):
                u = 0.0
                for (ctrl, omega, w, idx) in self.rows:
                    if ctrl != h:
                        continue
                    A = sum(vv[0, idx, j] * self._phi(j, n_basis, t)
                            for j in range(n_basis))
                    B = sum(vv[1, idx, j] * self._phi(j, n_basis, t)
                            for j in range(n_basis))
                    N = np.hypot(A, B)
                    if N < 1e-6:
                        continue
                    sig = 1.0 / (1.0 + np.exp(-min(max(N, -32.0), 32.0)))
                    sig = 1.0 if N > 32 else sig
                    u += omega * (2 * sig - 1) / N * (
                        np.cos(w * t) * A + np.sin(w * t) * B)
                H = H + u * Hk
            psi = scipy.linalg.expm(-1j * dt * H) @ psi
            t += dt
        return psi


def set_H(H0, Hs, channels, duration, func_type) -> None:
    """Register the controlled system (reference `diffqc.cc:43-73`)."""
    rows = _flatten_channels(channels)
    if bindings.available():
        sys = bindings.NativeSystem()
        sys.set_system(np.asarray(H0), list(Hs), rows, duration, func_type)
        _state["sys"], _state["fallback"] = sys, None
    else:
        fb = _NumpyFallback()
        fb.set_system(H0, Hs, rows, duration, func_type)
        _state["sys"], _state["fallback"] = None, fb


def trotter(psi0, T0, T, per_step, vv):
    """Evolve psi0 over [T0, T] (reference `diffqc.cc:173-205`).

    Returns a list of complex amplitudes (matching the pybind11 return of
    std::vector<std::complex<double>>)."""
    vv = np.asarray(vv, dtype=np.float64)
    if _state["sys"] is not None:
        out = _state["sys"].trotter(np.asarray(psi0), T0, T, per_step, vv)
    elif _state["fallback"] is not None:
        out = _state["fallback"].trotter(psi0, T0, T, per_step, vv)
    else:
        raise RuntimeError("call set_H first")
    return list(out)


def print_test() -> None:  # diffqc.cc:27-29
    print("hello")


def complex_test(psi0):  # diffqc.cc:31-34
    return list(np.asarray(psi0, dtype=np.complex128).reshape(-1))


def test_eigen(v):  # diffqc.cc:36-38
    return [list(map(float, row)) for row in v]
