"""Native C++ runtime vs numpy/scipy oracles and the JAX propagator."""
import numpy as np
import pytest
import scipy.linalg

from diffquantum_tpu.native import bindings
from diffquantum_tpu.ops import linalg

pytestmark = pytest.mark.skipif(not bindings.available(),
                                reason="native toolchain unavailable")


def ref_channel_amplitude(channels, h, t, vv, duration, func_type, n_basis):
    """Independent numpy implementation of the channel model semantics
    (`diffqc.cc:95-135`)."""
    from scipy.special import legendre as scipy_legendre, expit

    def phi(j, t):
        if func_type == 0:
            return scipy_legendre(j)(2 * t / duration - 1)
        tau = 1.0 / (n_basis - 2)
        c = tau * (j - 1.5)
        l, r = c - 1.5 * tau, c + 1.5 * tau
        tn = t / duration
        if tn <= l or tn >= r:
            return 0.0
        return (tn - l) * (tn - r) / (-(1.5 * tau) ** 2)

    ans = 0.0
    for (ctrl, omega, w, idx) in channels:
        if int(ctrl) != h:
            continue
        idx = int(idx)
        A = sum(vv[0, idx, j] * phi(j, t) for j in range(n_basis))
        B = sum(vv[1, idx, j] * phi(j, t) for j in range(n_basis))
        N = np.sqrt(A * A + B * B)
        if N < 1e-6:
            continue
        sig = 1.0 if N > 32 else (0.0 if N < -32 else expit(N))
        ans += omega * (2 * sig - 1) / N * (np.cos(w * t) * A +
                                            np.sin(w * t) * B)
    return ans


def ref_trotter_channel(H0, Hs, channels, duration, func_type, psi0, T0, T,
                        per_step, vv):
    n_basis = vv.shape[2]
    n_steps = int(per_step * (abs(T - T0) + 1))
    dt = (T - T0) / n_steps
    t = T0
    psi = np.asarray(psi0, dtype=np.complex128).copy()
    for _ in range(n_steps):
        H = np.asarray(H0, dtype=np.complex128).copy()
        for h, Hk in enumerate(Hs):
            u = ref_channel_amplitude(channels, h, t, vv, duration,
                                      func_type, n_basis)
            H = H + u * np.asarray(Hk)
        psi = scipy.linalg.expm(-1j * dt * H) @ psi
        t += dt
    return psi


def make_system(func_type=0, seed=0):
    rng = np.random.default_rng(seed)
    H0 = 0.2 * linalg.pauli_string("ZI")
    Hs = [linalg.pauli_string("XI"), linalg.pauli_string("IX")]
    # two channels on control 0 (different carriers), one on control 1
    channels = [(0, np.pi, 5.0, 0), (0, 0.5 * np.pi, 9.0, 1),
                (1, np.pi, 4.0, 2)]
    duration = 2.0
    n_basis = 5
    vv = rng.standard_normal((2, 3, n_basis)) * 0.7
    psi0 = linalg.uniform_superposition(2)
    return H0, Hs, channels, duration, n_basis, vv, psi0


def test_complex_roundtrip_and_version():
    psi = np.array([1 + 2j, 3 - 4j, 0.5j])
    np.testing.assert_allclose(bindings.complex_test(psi), psi)
    assert bindings.version() == "0.1.0"


@pytest.mark.parametrize("func_type", [0, 1])
def test_native_channel_trotter_vs_scipy(func_type):
    H0, Hs, channels, duration, n_basis, vv, psi0 = make_system(func_type)
    sys = bindings.NativeSystem()
    sys.set_system(H0, Hs, channels, duration, func_type)
    got = sys.trotter(psi0, 0.0, duration, 10, vv)
    want = ref_trotter_channel(H0, Hs, channels, duration, func_type, psi0,
                               0.0, duration, 10, vv)
    fid = abs(np.vdot(want, got)) ** 2
    assert fid > 1 - 1e-10, fid
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_native_simple_trotter_vs_jax():
    import jax.numpy as jnp

    from diffquantum_tpu.dynamics.hamiltonian import ControlledHamiltonian
    from diffquantum_tpu.dynamics.propagator import trotter
    from diffquantum_tpu.ops import cpx
    from diffquantum_tpu.pulses.envelope import SimpleEnvelope

    rng = np.random.default_rng(1)
    H0 = np.zeros((4, 4))
    Hs = [linalg.pauli_string("XI"), linalg.pauli_string("ZZ")]
    omegas = (np.pi, np.pi)
    T = 2.0
    n_basis = 5
    coeff = rng.standard_normal((2, n_basis)) * 0.5
    psi0 = linalg.uniform_superposition(2)

    sys = bindings.NativeSystem()
    sys.set_system(H0, Hs, [], T, 1)  # duration used for basis normalization
    got = sys.trotter_simple(psi0, 0.0, T, 10, coeff, omegas, "bspline")

    ham = ControlledHamiltonian.create(H0, Hs, dtype=jnp.float64)
    env = SimpleEnvelope(basis="bspline", n_basis=n_basis, omegas=omegas)
    want = cpx.to_complex(trotter(ham, env, jnp.asarray(coeff),
                                  cpx.from_complex(psi0, jnp.float64),
                                  0.0, T, per_step=10))
    fid = abs(np.vdot(want, got)) ** 2
    assert fid > 1 - 1e-10, fid
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_native_two_instances_coexist():
    # the reference's global-state design allows ONE system per process
    # (diffqc.cc:21-25); the rebuild is handle-based.
    H0a = np.zeros((2, 2))
    H0b = 0.7 * linalg.Z
    sa, sb = bindings.NativeSystem(), bindings.NativeSystem()
    sa.set_system(H0a, [linalg.X], [(0, np.pi, 0.0, 0)], 1.0, 0)
    sb.set_system(H0b, [linalg.Y], [(0, np.pi, 0.0, 0)], 1.0, 0)
    vv = np.zeros((2, 1, 3))
    psi = linalg.basis_state(0, 2)
    out_a = sa.trotter(psi, 0.0, 1.0, 5, vv)
    out_b = sb.trotter(psi, 0.0, 1.0, 5, vv)
    # with zero coefficients both evolve under H0 only
    np.testing.assert_allclose(out_a, psi, atol=1e-12)
    want_b = scipy.linalg.expm(-1j * np.asarray(H0b)) @ psi
    np.testing.assert_allclose(out_b, want_b, atol=1e-9)
