"""Reference-compatible ``SimulatorPlain`` facade.

A drop-in stand-in for the reference's ``sim_plain.SimulatorPlain``
(`/root/reference/sim_plain.py:14-505`): same constructor keywords, same
attribute contract (``sim.T``, ``sim.omegas``, ``sim.Pauli_M`` assigned
after construction — `demo_maxcut.py:44,69-79,47-65`), same method surface
(``trotter``, ``generate_u``, ``stochastic_measure``,
``compute_energy_grad_MC``, ``compute_energy_grad_FD``, ``train_energy``,
``train_energy_FD``, ``train_fidelity``, ``save_plot``, ``multi_kron``,
``multi_dot``, ``find_state``) — but the training loops execute on the
TPU-native JAX engine (CP real pairs, batched scans) instead of per-step
scipy expm + torch.

Interface notes / conscious divergences:
- operators/states are numpy arrays (no QuTiP ``Qobj`` — qutip is not a
  dependency of this framework); ``.full()``-style unwrapping is accepted
  via ``np.asarray``.
- ``train_*`` return a ``torch.tensor`` of the coefficients with
  ``requires_grad=True`` when torch is importable (reference parity,
  `sim_plain.py:305`), else a numpy array.
- ``Pauli_M`` entries may be ``[matrix, weight]`` — the eigensystem the
  reference precomputes in the demo (`demo_maxcut.py:64-65`) is computed
  internally if absent.
- ``measure_sample_times`` is accepted and ignored exactly like the
  reference (dead parameter, SURVEY.md §5).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..measure import Measurement
from ..dynamics.hamiltonian import ControlledHamiltonian
from ..ops import cpx, linalg
from ..pulses.basis import basis_matrix
from ..pulses.envelope import SimpleEnvelope
from ..train.config import TrainConfig
from ..train.energy import train_energy as _train_energy
from ..train.fidelity import train_fidelity as _train_fidelity
from ..utils.logger import Logger


def _maybe_torch(arr: np.ndarray):
    try:
        import torch
        return torch.tensor(arr, requires_grad=True)
    except Exception:
        return arr


class SimulatorPlain:
    """See module docstring. Constructor mirrors `sim_plain.py:20-22`."""

    def __init__(self, n_basis=5, basis="BSpline", n_epoch=200, log_dir=None,
                 n_step=100, lr=2e-2, is_noisy=False,
                 measure_sample_times=1000, method_name="Ours",
                 sampling_measure=False, per_step=10, seed=None):
        # ``seed`` is an extension over the reference constructor
        # (`sim_plain.py:20-22`): one persistent generator drives the MC
        # sample times, shot draws, and noise, so compat-layer runs are
        # reproducible (the reference draws from the unseeded global
        # numpy state). seed=None keeps OS-entropy behavior.
        self._rng = np.random.default_rng(seed)
        self.n_basis = n_basis
        self.basis = basis
        self.log_name = basis
        self.n_epoch = n_epoch
        self.n_step = n_step
        self.lr = lr
        self.is_noisy = is_noisy
        self.sampling_measure = sampling_measure
        self.per_step = per_step
        self.measure_sample_times = measure_sample_times  # dead (ref parity)
        self.logger = Logger(name=method_name, path=log_dir)
        self.logger.write_text("arguments ========")
        for k, v in dict(n_basis=n_basis, basis=basis, n_epoch=n_epoch,
                         n_step=n_step, lr=lr, is_noisy=is_noisy,
                         sampling_measure=sampling_measure,
                         per_step=per_step).items():
            self.logger.write_text(f"{k}: {v}")
        self.my_solver = self.trotter
        # attributes assigned by user code after construction (ref contract)
        self.T = 1.0
        self.omegas = []
        self.Pauli_M = []
        self.spectral_coeff = None
        self.final_state = None
        self.losses_energy = []

    # ---- small helpers (reference surface) ---------------------------
    @staticmethod
    def sigmoid(x):
        return 1.0 / (1.0 + math.exp(-x))

    multi_kron = staticmethod(linalg.multi_kron)
    multi_dot = staticmethod(linalg.multi_dot)
    find_state = staticmethod(linalg.find_state)

    def _envelope(self):
        return SimpleEnvelope(basis=self.basis, n_basis=self.n_basis,
                              omegas=tuple(float(w) for w in self.omegas))

    def generate_u(self, i, spectral_coeff):
        """Closure u_i(t, args) matching `sim_plain.py:73-99` (pointwise;
        the fast path evaluates the whole grid at once instead)."""
        coeff = np.asarray(spectral_coeff)

        def _u(t, args=None):
            phi = np.asarray(basis_matrix(self.basis, self.n_basis,
                                          jnp.asarray(float(t)), self.T))
            a = float(coeff[i] @ phi)
            return (self.sigmoid(a) * 2 - 1) * self.omegas[i]

        return _u

    # ---- propagation --------------------------------------------------
    def trotter(self, H_, psi0_, T0, T, **kw):
        """QuTiP-style list-of-[H, u] propagation (`sim_plain.py:119-153`),
        numpy in/out. Arbitrary Python envelope closures are supported (as
        in the reference), so this path runs stepwise in numpy/scipy."""
        import scipy.linalg
        psi = np.asarray(psi0_, dtype=np.complex128).reshape(-1)
        n_steps = int(self.per_step * (abs(T - T0) + 1))
        dt = (T - T0) / n_steps
        t = T0
        H0 = None
        pairs = []
        for h in H_:
            if isinstance(h, (list, tuple)):
                pairs.append((np.asarray(h[0], dtype=np.complex128), h[1]))
            else:
                H0 = np.asarray(h, dtype=np.complex128)
        if H0 is None:
            H0 = np.zeros_like(pairs[0][0])
        for _ in range(n_steps):
            H = H0.copy()
            for (Hk, u) in pairs:
                H += u(t, None) * Hk
            psi = scipy.linalg.expm(-1j * dt * H) @ psi
            t += dt
        return psi

    # ---- measurement ---------------------------------------------------
    def _pauli_terms(self):
        return [(np.asarray(entry[0], dtype=np.complex128), float(entry[1]))
                for entry in self.Pauli_M]

    def stochastic_measure(self, psi, per_Pauli=100):
        """Shot-based Pauli estimation (`sim_plain.py:101-117`)."""
        rng = self._rng
        psi = np.asarray(psi, dtype=np.complex128).reshape(-1)
        ans = 0.0
        for entry in self.Pauli_M:
            weight = float(entry[1])
            if len(entry) > 2:
                evals, estates = entry[2]
                estates = np.stack([np.asarray(e).reshape(-1)
                                    for e in estates], axis=1)
                evals = np.asarray(evals)
            else:
                evals, estates = np.linalg.eigh(np.asarray(entry[0]))
            probs = np.abs(estates.conj().T @ psi) ** 2
            probs = probs / probs.sum()
            draws = rng.choice(len(evals), per_Pauli, p=probs)
            freqs = np.bincount(draws, minlength=len(evals)) / per_Pauli
            ans += weight * float(evals @ freqs)
        return ans

    # ---- gradients (numpy, reference algorithms) -----------------------
    def _measure(self, M, psi, rng):
        if self.sampling_measure:
            v = self.stochastic_measure(psi)
        else:
            v = float(np.real(np.vdot(psi, np.asarray(M) @ psi)))
        if self.is_noisy:
            v += rng.normal(scale=abs(v) / 5)
        return v

    def compute_energy_grad_MC(self, M, H, initial_state, coeff=1.0):
        """The paper's MC estimator, reference algorithm shape
        (`sim_plain.py:156-231`), numpy execution."""
        rng = self._rng
        s = rng.uniform() * self.T
        sc = np.asarray(self._coeff_np())
        n_hs = len(H) - 1

        phi_s = np.asarray(basis_matrix(self.basis, self.n_basis,
                                        jnp.asarray(float(s)), self.T))
        from ..pulses.basis import canonical_kind
        if canonical_kind(self.basis) in ("legendre", "bspline"):
            a = sc @ phi_s
            sig = 1.0 / (1.0 + np.exp(-a))
            dDdv = (2 * sig * (1 - sig) * np.asarray(self.omegas))[:, None] \
                * phi_s[None, :]
        else:
            # reference quirk, `sim_plain.py:224-230`: poly/Fourier use the
            # RAW basis values (no sigmoid chain factor) — this facade keeps
            # that behavior exactly; the engine-level estimator exposes it as
            # chain='reference' (gradients/mc.py).
            dDdv = np.broadcast_to(phi_s[None, :], sc.shape).copy()

        phi = self.trotter(H, initial_state, 0, s)
        r = 0.5
        d = phi.shape[0]
        grad = np.zeros_like(sc)
        for i in range(n_hs):
            Hk = np.asarray(H[i + 1][0], dtype=np.complex128)
            gate_p = (np.eye(d) + r * 1j * Hk) / np.sqrt(1 + r**2)
            gate_m = (np.eye(d) - r * 1j * Hk) / np.sqrt(1 + r**2)
            ket_p = self.trotter(H, gate_p @ phi, s, self.T)
            ket_m = self.trotter(H, gate_m @ phi, s, self.T)
            ps_p = self._measure(M, ket_p, rng)
            ps_m = self._measure(M, ket_m, rng)
            ps = coeff * (1 + r**2) / (2 * r) * (ps_m - ps_p)
            grad[i] = ps * dDdv[i]
        return _maybe_torch(grad)

    def compute_energy_grad_FD(self, M, H, initial_state, delta=1e-3,
                               coeff=1.0):
        """Central finite differences (`sim_plain.py:308-353`)."""
        rng = self._rng
        sc = self._coeff_np()
        n_hs = len(H) - 1
        grad = np.zeros_like(sc)

        def run(cf):
            Hl = [H[0]] + [[H[i + 1][0], self.generate_u(i, cf)]
                           for i in range(n_hs)]
            psi = self.trotter(Hl, initial_state, 0, self.T)
            return self._measure(M, psi, rng)

        for i in range(n_hs):
            for j in range(self.n_basis):
                cp_, cm_ = sc.copy(), sc.copy()
                cp_[i, j] += delta
                cm_[i, j] -= delta
                grad[i, j] = (run(cp_) - run(cm_)) / (2 * delta)
        return _maybe_torch(grad)

    def _coeff_np(self) -> np.ndarray:
        c = self.spectral_coeff
        if c is None:
            raise RuntimeError("no spectral_coeff yet")
        if hasattr(c, "detach"):
            return c.detach().numpy().copy()
        return np.asarray(c).copy()

    # ---- training (fast path: the JAX engine) --------------------------
    def _build(self, M, H0, Hs):
        ham = ControlledHamiltonian.create(np.asarray(H0),
                                           [np.asarray(h) for h in Hs],
                                           dtype=jnp.float32)
        env = self._envelope()
        terms = self._pauli_terms() if self.Pauli_M else None
        meas = Measurement.create(np.asarray(M), terms=terms,
                                  dtype=jnp.float32,
                                  sampling=self.sampling_measure,
                                  noisy=self.is_noisy)
        return ham, env, meas

    def _config(self, grad_mode):
        return TrainConfig(n_basis=self.n_basis, basis=self.basis,
                           n_epoch=self.n_epoch, lr=self.lr,
                           is_noisy=self.is_noisy,
                           sampling_measure=self.sampling_measure,
                           per_step=self.per_step, n_step=self.n_step,
                           grad_mode=grad_mode)

    def train_energy(self, M, H0, Hs, initial_state):
        """Reference `sim_plain.py:245-305` — MC gradients, Adam."""
        ham, env, meas = self._build(M, H0, Hs)
        psi0 = cpx.from_complex(np.asarray(initial_state).reshape(-1))
        res = _train_energy(ham, env, meas, psi0, self.T,
                            self._config("mc"), logger=self.logger)
        self.losses_energy = res.losses_energy
        self.final_state = cpx.to_complex(res.final_state)
        self.spectral_coeff = _maybe_torch(np.asarray(res.coeff))
        return self.spectral_coeff

    def train_energy_FD(self, M, H0, Hs, initial_state, delta=1e-3):
        """Reference `sim_plain.py:355-412` — FD gradients."""
        ham, env, meas = self._build(M, H0, Hs)
        psi0 = cpx.from_complex(np.asarray(initial_state).reshape(-1))
        cfg = self._config("fd").replace(fd_delta=delta)
        res = _train_energy(ham, env, meas, psi0, self.T, cfg,
                            logger=self.logger)
        self.losses_energy = res.losses_energy
        self.final_state = cpx.to_complex(res.final_state)
        self.spectral_coeff = _maybe_torch(np.asarray(res.coeff))
        return self.spectral_coeff

    def train_fidelity(self, H0, Hs, initial_states, target_states):
        """Reference `sim_plain.py:414-475` — per-pair MC steps."""
        ham = ControlledHamiltonian.create(np.asarray(H0),
                                           [np.asarray(h) for h in Hs],
                                           dtype=jnp.float32)
        env = self._envelope()
        ini = cpx.from_complex(np.stack(
            [np.asarray(p).reshape(-1) for p in initial_states]))
        tgt = cpx.from_complex(np.stack(
            [np.asarray(p).reshape(-1) for p in target_states]))
        res = _train_fidelity(ham, env, ini, tgt, self.T,
                              self._config("mc"), logger=self.logger,
                              per_pair=True)
        self.losses_energy = res.losses_energy
        self.final_state = cpx.to_complex(res.final_state)
        self.spectral_coeff = _maybe_torch(np.asarray(res.coeff))
        return self.spectral_coeff

    def save_plot(self, plot_name):
        """Waveform plot — ENABLED (the reference's is dead code behind an
        early return, `sim_plain.py:233-243`)."""
        if self.spectral_coeff is None:
            return
        from ..utils.plotting import save_pulse_plot
        save_pulse_plot(self._envelope(), self._coeff_np(), self.T,
                        f"{self.log_name}_{plot_name}.png")
