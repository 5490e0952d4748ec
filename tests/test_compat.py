"""Reference-API compatibility layer: diffqc module + SimulatorPlain."""
import numpy as np

from diffquantum_tpu.compat import diffqc
from diffquantum_tpu.compat.sim_plain import SimulatorPlain
from diffquantum_tpu.ops import linalg


def test_diffqc_module_surface(capsys):
    assert diffqc.__version__ == "dev"
    diffqc.print_test()
    assert capsys.readouterr().out.strip() == "hello"
    psi = [1 + 2j, 3j]
    assert diffqc.complex_test(psi) == [complex(1, 2), complex(0, 3)]
    assert diffqc.test_eigen([[1, 2], [3, 4]]) == [[1.0, 2.0], [3.0, 4.0]]


def test_diffqc_set_h_trotter_roundtrip():
    # constant zero coefficients → evolve under H0 only
    H0 = 0.4 * linalg.Z
    Hs = [linalg.X]
    channels = [[[0.0, np.pi, 3.0, 0]]]  # one channel on control 0
    diffqc.set_H(H0.tolist(), [Hs[0].tolist()], channels, 1.0, 0)
    psi0 = [1.0 + 0j, 0j]
    out = np.asarray(diffqc.trotter(psi0, 0.0, 1.0, 10, np.zeros((2, 1, 4))))
    import scipy.linalg
    want = scipy.linalg.expm(-1j * np.asarray(H0)) @ np.asarray(psi0)
    np.testing.assert_allclose(out, want, atol=1e-9)


def test_diffqc_channel_drive_changes_state():
    H0 = np.zeros((2, 2))
    diffqc.set_H(H0.tolist(), [linalg.X.tolist()],
                 [[[0.0, np.pi, 0.0, 0]]], 1.0, 1)
    vv = np.zeros((2, 1, 5))
    vv[0, 0, :] = 2.0  # strong A quadrature
    out = np.asarray(diffqc.trotter([1, 0], 0.0, 1.0, 20, vv))
    assert abs(out[1]) > 0.1  # population transferred


def make_demo_sim(tmp_path, n_epoch=30):
    sim = SimulatorPlain(lr=5e-2, n_basis=6, n_epoch=n_epoch,
                         log_dir=str(tmp_path))
    n_qubit = 4
    graph = [[0, 1], [0, 3], [1, 2], [2, 3]]
    I, Z, X = linalg.I2, linalg.Z, linalg.X
    II = linalg.multi_kron(*[I] * n_qubit)
    H_cost = II * 0.0
    sim.Pauli_M = []
    for e in graph:
        curr = linalg.multi_kron(*[Z if j in e else I for j in range(n_qubit)])
        sim.Pauli_M.append([curr, 0.5])
        H_cost = H_cost + II - curr
    H_cost = -H_cost * 0.5
    sim.Pauli_M.append([II, -0.5 * len(graph)])
    Hs, omegas = [], []
    for e in graph:
        Hs.append(linalg.multi_kron(*[Z if j in e else I
                                      for j in range(n_qubit)]))
        omegas.append(np.pi)
    for q in range(n_qubit):
        Hs.append(linalg.multi_kron(*[X if j == q else I
                                      for j in range(n_qubit)]))
        omegas.append(np.pi)
    sim.omegas = omegas
    sim.T = np.pi * 2.0
    psi0 = linalg.uniform_superposition(n_qubit)
    return sim, H_cost, II * 0.0, Hs, psi0


def test_simulator_plain_train_energy(tmp_path):
    sim, M, H0, Hs, psi0 = make_demo_sim(tmp_path, n_epoch=40)
    coeff = sim.train_energy(M, H0, Hs, psi0)
    assert sim.losses_energy[-1] < sim.losses_energy[0]
    state, prob = sim.find_state(sim.final_state)
    assert prob.shape == (16,)
    # coefficients returned torch-style (reference parity) when available
    assert hasattr(coeff, "detach") or isinstance(coeff, np.ndarray)


def test_simulator_plain_trotter_and_grads(tmp_path):
    sim, M, H0, Hs, psi0 = make_demo_sim(tmp_path, n_epoch=2)
    rng = np.random.default_rng(0)
    sim.spectral_coeff = rng.standard_normal((len(Hs), sim.n_basis)) * 0.1
    H = [H0] + [[Hs[i], sim.generate_u(i, sim.spectral_coeff)]
                for i in range(len(Hs))]
    out = sim.trotter(H, psi0, 0, sim.T)
    assert abs(np.linalg.norm(out) - 1.0) < 1e-9
    g = sim.compute_energy_grad_MC(M, H, psi0)
    g_np = g.detach().numpy() if hasattr(g, "detach") else np.asarray(g)
    assert g_np.shape == (len(Hs), sim.n_basis)
    assert np.all(np.isfinite(g_np))


def test_simulator_plain_stochastic_measure(tmp_path):
    sim, M, H0, Hs, psi0 = make_demo_sim(tmp_path, n_epoch=2)
    v = sim.stochastic_measure(psi0, per_Pauli=20000)
    want = float(np.real(np.vdot(psi0, M @ psi0)))
    assert abs(v - want) < 0.1


def test_save_plot_writes_png(tmp_path, monkeypatch):
    sim, M, H0, Hs, psi0 = make_demo_sim(tmp_path, n_epoch=2)
    rng = np.random.default_rng(1)
    sim.spectral_coeff = rng.standard_normal((len(Hs), sim.n_basis))
    monkeypatch.chdir(tmp_path)
    sim.save_plot("test")
    import os
    pngs = [f for f in os.listdir(tmp_path) if f.endswith(".png")]
    assert pngs, "no waveform png written"


def test_simulator_plain_mc_grad_poly_uses_raw_basis(tmp_path):
    """Reference quirk parity (`sim_plain.py:224-230`): for poly/Fourier the
    facade's MC grad rows are ps_i * phi(s) — the RAW basis values, no
    sigmoid chain factor — so all rows share one direction phi(s) even for
    wildly different coefficient rows (the sigmoid factor would scale
    COLUMNS per-row, breaking proportionality only in the chain='exact'
    case where a != a')."""
    sim = SimulatorPlain(lr=1e-2, n_basis=3, n_epoch=1, basis="poly",
                         log_dir=str(tmp_path))
    sim.omegas = [np.pi, np.pi]
    sim.T = 1.0
    sim.spectral_coeff = np.array([[0.3, -0.8, 1.2], [2.0, 0.1, -0.5]])
    H = [np.zeros((2, 2))] + [
        [op, sim.generate_u(i, sim.spectral_coeff)]
        for i, op in enumerate([linalg.X, linalg.Z])]
    M = np.diag([1.0, -1.0]).astype(np.complex128)
    psi0 = np.array([1.0, 0.0], dtype=np.complex128)
    g = sim.compute_energy_grad_MC(M, H, psi0)
    if hasattr(g, "detach"):
        g = g.detach().numpy()
    g = np.asarray(g)
    n0, n1 = np.linalg.norm(g[0]), np.linalg.norm(g[1])
    if n0 > 1e-14 and n1 > 1e-14:
        cos = abs(float(g[0] @ g[1]) / (n0 * n1))
        assert cos > 1.0 - 1e-10, g
