"""ctypes bindings for the native CPU runtime (libdiffqc_core.so).

Replaces the reference's pybind11 binding layer (`/root/reference/
diffqc.cc:210-228`, built via CMake + a pybind11 git submodule,
`CMakeLists.txt:23-24`) with a dependency-free C ABI + ctypes. The library
is built on demand with the Makefile next to this file; if no C++ toolchain
is available the import still succeeds and ``available()`` returns False —
all functionality has JAX/numpy equivalents.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libdiffqc_core.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _HERE, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    D = ctypes.POINTER(ctypes.c_double)
    lib.dqc_create.restype = ctypes.c_int
    lib.dqc_destroy.argtypes = [ctypes.c_int]
    lib.dqc_set_system.restype = ctypes.c_int
    lib.dqc_set_system.argtypes = [
        ctypes.c_int, D, D, ctypes.c_int, D, D, ctypes.c_int, D,
        ctypes.c_int, ctypes.c_double, ctypes.c_int]
    lib.dqc_trotter.restype = ctypes.c_int
    lib.dqc_trotter.argtypes = [
        ctypes.c_int, D, D, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, D, ctypes.c_int, ctypes.c_int, D, D]
    lib.dqc_trotter_simple.restype = ctypes.c_int
    lib.dqc_trotter_simple.argtypes = [
        ctypes.c_int, D, D, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, D, D, ctypes.c_int, ctypes.c_int, ctypes.c_int, D, D]
    lib.dqc_complex_test.restype = ctypes.c_int
    lib.dqc_complex_test.argtypes = [D, D, ctypes.c_int, D, D]
    lib.dqc_version.restype = ctypes.c_char_p
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


_BASIS_KINDS = {"poly": 0, "legendre": 1, "fourier": 2, "bspline": 3}


class NativeSystem:
    """Handle-based native propagation context.

    Unlike the reference's single global system (`diffqc.cc:21-25`),
    arbitrarily many NativeSystem instances can coexist in one process.
    """

    def __init__(self):
        lib = _load()
        if lib is None:
            raise RuntimeError("libdiffqc_core.so unavailable (no toolchain?)")
        self._lib = lib
        self._h = lib.dqc_create()

    def __del__(self):
        try:
            self._lib.dqc_destroy(self._h)
        except Exception:
            pass

    def set_system(self, H0, Hs: Sequence, channels: Sequence[Sequence[float]],
                   duration: float, func_type: int) -> None:
        """channels: rows (control, omega, w, idx) — the reference's nested
        channel table flattened with an explicit control column
        (`diffqc.cc:103-111` keeps the control implicit in list nesting)."""
        H0 = np.ascontiguousarray(np.asarray(H0, dtype=np.complex128))
        d = H0.shape[0]
        Hs_arr = np.ascontiguousarray(
            np.stack([np.asarray(h, dtype=np.complex128) for h in Hs])
            if len(Hs) else np.zeros((0, d, d), np.complex128))
        ch = np.ascontiguousarray(
            np.asarray(channels, dtype=np.float64).reshape(-1, 4)
            if len(channels) else np.zeros((0, 4)))
        h0_re = np.ascontiguousarray(H0.real)
        h0_im = np.ascontiguousarray(H0.imag)
        hs_re = np.ascontiguousarray(Hs_arr.real)
        hs_im = np.ascontiguousarray(Hs_arr.imag)
        rc = self._lib.dqc_set_system(
            self._h, _dptr(h0_re), _dptr(h0_im), d, _dptr(hs_re),
            _dptr(hs_im), len(Hs), _dptr(ch), ch.shape[0],
            ctypes.c_double(float(duration)), int(func_type))
        if rc != 0:
            raise RuntimeError(f"dqc_set_system failed: {rc}")
        self._dim = d

    def trotter(self, psi0, T0: float, T: float, per_step: int,
                vv: np.ndarray) -> np.ndarray:
        """Channel-model evolution; vv [2, n_idx, n_basis]
        (`diffqc.cc:173-205` semantics)."""
        psi0 = np.asarray(psi0, dtype=np.complex128).reshape(-1)
        d = psi0.shape[0]
        vv = np.ascontiguousarray(np.asarray(vv, dtype=np.float64))
        _, n_idx, n_basis = vv.shape
        p_re = np.ascontiguousarray(psi0.real)
        p_im = np.ascontiguousarray(psi0.imag)
        o_re = np.empty(d)
        o_im = np.empty(d)
        rc = self._lib.dqc_trotter(
            self._h, _dptr(p_re), _dptr(p_im), d, ctypes.c_double(float(T0)),
            ctypes.c_double(float(T)), int(per_step), _dptr(vv), n_idx,
            n_basis, _dptr(o_re), _dptr(o_im))
        if rc != 0:
            raise RuntimeError(f"dqc_trotter failed: {rc}")
        return o_re + 1j * o_im

    def trotter_simple(self, psi0, T0: float, T: float, per_step: int,
                       coeff: np.ndarray, omegas: Sequence[float],
                       basis: str) -> np.ndarray:
        """Simple-envelope evolution (`sim_plain.py:73-99` pulse model)."""
        psi0 = np.asarray(psi0, dtype=np.complex128).reshape(-1)
        d = psi0.shape[0]
        coeff = np.ascontiguousarray(np.asarray(coeff, dtype=np.float64))
        n_hs, n_basis = coeff.shape
        om = np.ascontiguousarray(np.asarray(omegas, dtype=np.float64))
        p_re = np.ascontiguousarray(psi0.real)
        p_im = np.ascontiguousarray(psi0.imag)
        o_re = np.empty(d)
        o_im = np.empty(d)
        rc = self._lib.dqc_trotter_simple(
            self._h, _dptr(p_re), _dptr(p_im), d, ctypes.c_double(float(T0)),
            ctypes.c_double(float(T)), int(per_step), _dptr(coeff), _dptr(om),
            n_hs, n_basis, _BASIS_KINDS[basis.lower()], _dptr(o_re),
            _dptr(o_im))
        if rc != 0:
            raise RuntimeError(f"dqc_trotter_simple failed: {rc}")
        return o_re + 1j * o_im


def complex_test(psi: np.ndarray) -> np.ndarray:
    """Round-trip smoke test (reference binding parity, `diffqc.cc:31-34`)."""
    lib = _load()
    psi = np.asarray(psi, dtype=np.complex128).reshape(-1)
    p_re = np.ascontiguousarray(psi.real)
    p_im = np.ascontiguousarray(psi.imag)
    o_re = np.empty_like(p_re)
    o_im = np.empty_like(p_im)
    lib.dqc_complex_test(_dptr(p_re), _dptr(p_im), psi.size, _dptr(o_re),
                         _dptr(o_im))
    return o_re + 1j * o_im


def version() -> str:
    lib = _load()
    return lib.dqc_version().decode() if lib else "unavailable"
