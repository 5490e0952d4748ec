"""Ab-initio H2 pipeline: integrals -> JW Hamiltonian -> strings -> VQE.

Oracles: textbook STO-3G anchors (RHF -1.1167 Ha, FCI -1.1373 Ha at
R = 0.7414 A; dissociation to two H atoms 2 x -0.46658 Ha), the published
2-qubit-reduced coefficients used by models/vqe_h2.py, and dense
diagonalization at every bond length.
"""
import jax.numpy as jnp
import numpy as np

from diffquantum_tpu.models import molecule as mol
from diffquantum_tpu.ops import linalg
import pytest

R_EQ = 0.7414  # Angstrom


def test_rhf_and_fci_anchors():
    np.testing.assert_allclose(mol.rhf_energy(R_EQ), -1.11668, atol=2e-5)
    np.testing.assert_allclose(mol.fci_energy(R_EQ), -1.13727, atol=2e-5)
    # electronic part matches the published table vqe_h2 hardcodes
    # (O'Malley et al. round to 4 decimals -> 2e-4 tolerance)
    H, _ = mol.h2_electronic_hamiltonian(R_EQ)
    np.testing.assert_allclose(np.linalg.eigvalsh(H)[0], -1.8512, atol=2e-4)


def test_dissociation_limit():
    """FCI in a minimal basis dissociates correctly to two H atoms."""
    e_atom = -0.46658  # H atom, STO-3G
    np.testing.assert_allclose(mol.fci_energy(5.0), 2 * e_atom, atol=2e-4)
    # RHF does NOT (the textbook RHF dissociation failure)
    assert mol.rhf_energy(5.0) > 2 * e_atom + 0.1


def test_pauli_decomposition_reconstructs():
    H, _ = mol.h2_electronic_hamiltonian(1.0)
    terms = mol.pauli_decompose(H)
    rebuilt = sum(w * linalg.pauli_string(lbl) for lbl, w in terms)
    np.testing.assert_allclose(rebuilt, H, atol=1e-10)


def test_number_and_sz_symmetry():
    """The electronic Hamiltonian conserves particle number and S_z: it
    must not mix the HF determinant out of the (N=2, Sz=0) sector."""
    H, _ = mol.h2_electronic_hamiltonian(R_EQ)
    # occupation-number operator diag for JW order (g-up g-dn u-up u-dn)
    n_op = np.zeros(16)
    sz = np.zeros(16)
    for j in range(16):
        bits = [(j >> (3 - q)) & 1 for q in range(4)]
        n_op[j] = sum(bits)
        sz[j] = (bits[0] - bits[1] + bits[2] - bits[3]) / 2.0
    comm_n = H @ np.diag(n_op) - np.diag(n_op) @ H
    comm_s = H @ np.diag(sz) - np.diag(sz) @ H
    assert np.abs(comm_n).max() < 1e-10
    assert np.abs(comm_s).max() < 1e-10


def test_h2_vqe_chemical_accuracy():
    from diffquantum_tpu.train import TrainConfig, train_energy
    prob = mol.build_h2_at(R_EQ, dtype=jnp.float64)
    cfg = TrainConfig(n_basis=6, n_epoch=300, lr=5e-2, grad_mode="adjoint",
                      dtype="float64", seed=0)
    res = train_energy(prob.ham, prob.envelope, prob.measurement, prob.psi0,
                       prob.T, cfg, lam_min=prob.exact_ground_energy)
    assert res.losses_energy[-1] < 1.6e-3  # chemical accuracy (Ha)


def test_h2_vqe_stretched_geometry():
    """Strong correlation regime (R = 1.5 A) where RHF fails badly — the
    pulse VQE must still land near FCI."""
    from diffquantum_tpu.train import TrainConfig, train_energy
    prob = mol.build_h2_at(1.5, dtype=jnp.float64)
    cfg = TrainConfig(n_basis=6, n_epoch=300, lr=5e-2, grad_mode="adjoint",
                      dtype="float64", seed=0)
    res = train_energy(prob.ham, prob.envelope, prob.measurement, prob.psi0,
                       prob.T, cfg, lam_min=prob.exact_ground_energy)
    assert res.losses_energy[-1] < 5e-3


def test_cluster_pipeline_matches_symmetry_path():
    """The general SCF cluster path must reproduce the closed-form
    symmetry-orbital H2 values (FCI is invariant to the MO basis)."""
    H_gen, enuc_g, e_rhf = mol.cluster_electronic_hamiltonian(
        [(0, 0, 0), (0, 0, R_EQ)])
    np.testing.assert_allclose(np.linalg.eigvalsh(H_gen)[0] + enuc_g,
                               mol.fci_energy(R_EQ), atol=1e-7)
    np.testing.assert_allclose(e_rhf, mol.rhf_energy(R_EQ), atol=1e-9)


def test_pauli_decompose_fast_matches_slow():
    H, _ = mol.h2_electronic_hamiltonian(1.1)
    slow = dict(mol.pauli_decompose(H))
    fast = dict(mol.pauli_decompose_fast(H.real))
    assert set(slow) == set(fast)
    for k in slow:
        np.testing.assert_allclose(slow[k], fast[k], atol=1e-10)


def test_sector_projection_h3_plus():
    """The Fock-space global minimum is NOT the physical answer for H3+
    (it lives in a higher-N sector); the sector-projected FCI is ~25 mHa
    below RHF, a physically sensible 2-electron correlation energy."""
    coords = [(0, 0, 0), (0.9, 0, 0), (0.45, 0.45 * np.sqrt(3), 0)]
    H3, enuc, e_rhf = mol.cluster_electronic_hamiltonian(coords, charge=1)
    e_fock_min = float(np.linalg.eigvalsh(H3)[0]) + enuc
    e_fci = mol.sector_ground_energy(H3, 2) + enuc
    assert e_fock_min < e_fci - 0.01      # global min is unphysical
    assert e_rhf - 0.05 < e_fci < e_rhf - 0.01   # sane correlation energy


def test_size_consistency_two_far_h2():
    """FCI(H4 = two H2 at 50 A) = 2 x FCI(H2) — a strong end-to-end check
    of the integrals, SCF, and two-body Hamiltonian assembly."""
    H4, enuc4, _ = mol.cluster_electronic_hamiltonian(
        [(0, 0, 0), (0, 0, R_EQ), (50, 0, 0), (50, 0, R_EQ)])
    fci4 = mol.sector_ground_energy(H4, 4) + enuc4
    np.testing.assert_allclose(fci4, 2 * mol.fci_energy(R_EQ), atol=1e-6)


def test_number_penalty_is_diagonal_and_correct():
    terms = mol.number_penalty_terms(4, 2, lam=3.0)
    assert all(set(lbl) <= {"I", "Z"} for lbl, _ in terms)
    rebuilt = sum(w * linalg.pauli_string(lbl) for lbl, w in terms)
    want = np.diag([3.0 * (bin(j).count("1") - 2) ** 2 for j in range(16)])
    np.testing.assert_allclose(rebuilt, want, atol=1e-10)


@pytest.mark.slow
def test_h3_plus_vqe_near_sector_ground():
    """6-qubit H3+ pulse VQE with the number penalty lands near the sector
    FCI energy. The landscape has seed-dependent plateaus, so this uses the
    framework's seed-parallel trainer (best of 8) — the production recipe
    for rough VQE landscapes."""
    from diffquantum_tpu.parallel.mesh import train_energy_seeds
    from diffquantum_tpu.train import TrainConfig
    coords = [(0, 0, 0), (0.9, 0, 0), (0.45, 0.45 * np.sqrt(3), 0)]
    prob = mol.build_hydrogen_cluster(coords, charge=1, dtype=jnp.float64)
    cfg = TrainConfig(n_basis=6, n_epoch=300, lr=5e-2, grad_mode="adjoint",
                      dtype="float64", seed=0)
    res = train_energy_seeds(prob.ham, prob.envelope, prob.measurement,
                             prob.psi0, prob.T, cfg, n_seeds=6)
    err = float(res.best_loss) - prob.exact_ground_energy
    # richer entangler set (see build_hydrogen_cluster) + best-of-6:
    # near chemical accuracy (nearest-neighbor-only drives plateau
    # ~12 mHa above; best-of-8 x 400 epochs reaches 1.9 mHa)
    assert err < 8e-3, err


def test_h4_chain_builder_and_correlation():
    """H4 chain (8 qubits): builder produces a valid problem; FCI sits a
    chemically sensible 40-70 mHa below RHF (the strong-correlation
    regime the demo trains on — training itself is TPU-budget,
    demos/demo_h4_chain.py)."""
    coords = [(0.0, 0.0, 0.9 * i) for i in range(4)]
    prob = mol.build_hydrogen_cluster(coords, T=5.0, n_basis=6)
    _, _, e_rhf = mol.cluster_electronic_hamiltonian(coords)
    e_fci = prob.exact_ground_energy + prob.e_nuc
    corr = e_rhf - e_fci
    assert 0.04 < corr < 0.07, corr
    assert prob.ham.n_controls == 55  # 16 X/Y + 13 pairs x 3 kinds
    assert prob.psi0.re[0b11110000] == 1.0  # RHF determinant


def test_symbolic_jw_matches_dense_ladders():
    """jw_pauli_terms (mask algebra, no 2^n matrices) must reproduce the
    dense-ladder + trace-decomposition terms exactly — H2 and H3+."""
    cases = [([(0, 0, 0), (0, 0, R_EQ)], 0),
             ([(0, 0, 0), (0.9, 0, 0), (0.45, 0.45 * np.sqrt(3), 0)], 1)]
    for coords, charge in cases:
        centers = [np.asarray(c) * mol.ANGSTROM_TO_BOHR for c in coords]
        S, h, g, _ = mol.cluster_integrals(centers)
        _, C = mol.rhf_scf(S, h, g, (len(coords) - charge) // 2)
        h_mo = C.T @ h @ C
        g_mo = np.einsum("ijkl,ip,jq,kr,ls->pqrs", g, C, C, C, C)
        sym = dict(mol.jw_pauli_terms(h_mo, g_mo))
        H, _, _ = mol.cluster_electronic_hamiltonian(coords, charge)
        dense = dict(mol.pauli_decompose_fast(H.real))
        assert set(sym) == set(dense)
        for k in sym:
            np.testing.assert_allclose(sym[k], dense[k], atol=1e-12)
        # strings-projected sector FCI == dense sector FCI
        ne = len(coords) - charge
        f1 = mol.sector_fci_from_strings(list(sym.items()),
                                         2 * len(coords), ne)
        f2 = mol.sector_ground_energy(H, ne)
        np.testing.assert_allclose(f1, f2, atol=1e-10)


@pytest.mark.slow
def test_h6_chain_builder_matrix_free():
    """H6 (12 spin orbitals): fully matrix-free construction — symbolic JW
    terms, structure-tagged (fused-eligible) drives, sector-FCI oracle
    from the strings. Correlation energy must be chemically sensible."""
    coords = [(0.0, 0.0, 0.9 * i) for i in range(6)]
    prob = mol.build_hydrogen_cluster(coords, T=5.0, n_basis=6)
    assert prob.ham.is_structured_only
    kinds = {st.kind for st in prob.ham.structure}
    assert kinds == {"1q", "hop", "diag"}  # hopping entanglers present
    centers = [np.asarray(c) * mol.ANGSTROM_TO_BOHR for c in coords]
    S, h, g, e_nuc = mol.cluster_integrals(centers)
    e_rhf, _ = mol.rhf_scf(S, h, g, 3)
    corr = (e_rhf + e_nuc) - (prob.exact_ground_energy + prob.e_nuc)
    assert 0.06 < corr < 0.11, corr       # ~84 mHa at R = 0.9 A
