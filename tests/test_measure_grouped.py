"""Qubit-wise-commuting (QWC) grouped shot sampling for Pauli sums:
grouping correctness, molecular-scale compression, and unbiasedness of the
shared-shot estimator (measure.py::qwc_groups /
stochastic_measure_strings)."""
import jax
import jax.numpy as jnp
import numpy as np

from diffquantum_tpu.measure import (PauliStringSet, qwc_groups,
                                     stochastic_measure_strings)
from diffquantum_tpu.ops import cpx
import pytest

F64 = jnp.float64

I2 = np.eye(2)
PAULI = {"I": I2, "X": np.array([[0, 1], [1, 0]], complex),
         "Y": np.array([[0, -1j], [1j, 0]]), "Z": np.diag([1.0, -1.0])}


def _dense(terms):
    n = len(terms[0][0])
    m = np.zeros((2**n, 2**n), complex)
    for label, w in terms:
        op = np.array([[1.0]])
        for ch in label:
            op = np.kron(op, PAULI[ch])
        m = m + w * op
    return m


def _rand_state(n, seed):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(2**n) + 1j * rng.standard_normal(2**n)
    return v / np.linalg.norm(v)


def test_qwc_grouping_rules():
    # ZZ and ZI share bases (both Z on q0); XI conflicts with both
    ps = PauliStringSet.create([("ZZ", 1.0), ("ZI", 1.0), ("XI", 1.0),
                                ("XY", 1.0)], dtype=F64)
    groups = qwc_groups(ps.flips, ps.yz_masks)
    assert len(groups) == 2
    idx = [tuple(sorted(g[3])) for g in groups]
    assert (0, 1) in idx          # ZZ with ZI
    assert (2, 3) in idx          # XI with XY


def test_qwc_identity_compatible_with_everything():
    ps = PauliStringSet.create([("II", 2.0), ("XZ", 1.0), ("XI", 0.3)],
                               dtype=F64)
    groups = qwc_groups(ps.flips, ps.yz_masks)
    assert len(groups) == 1


def test_qwc_molecular_compression():
    """H4's JW Pauli sum: hundreds of strings must collapse to far fewer
    QWC measurement settings (the point of grouping — one rotation + one
    shot batch per group instead of per term)."""
    from diffquantum_tpu.models.molecule import (ANGSTROM_TO_BOHR,
                                                 cluster_integrals,
                                                 jw_pauli_terms, rhf_scf)
    centers = [np.array([0, 0, z]) * ANGSTROM_TO_BOHR
               for z in (0.0, 0.9, 1.8, 2.7)]
    S, h, g, _ = cluster_integrals(centers)
    _, C = rhf_scf(S, h, g, 2)
    h_mo = C.T @ h @ C
    g_mo = np.einsum("ijkl,ip,jq,kr,ls->pqrs", g, C, C, C, C)
    terms = jw_pauli_terms(h_mo, g_mo)
    ps = PauliStringSet.create(terms, dtype=F64)
    groups = qwc_groups(ps.flips, ps.yz_masks)
    assert ps.n_terms > 100
    assert len(groups) < ps.n_terms / 2.5, (ps.n_terms, len(groups))
    # every term lands in exactly one group
    covered = sorted(t for g in groups for t in g[3])
    assert covered == list(range(ps.n_terms))


def test_grouped_sampling_unbiased_multigroup():
    """Exact-vs-sampled convergence on a sum that spans several QWC groups
    with shared shots inside each group."""
    terms = [("ZZI", -1.0), ("IZZ", -0.7), ("XXI", 0.5), ("IXX", 0.3),
             ("YIY", 0.4), ("ZIZ", 0.2), ("IIX", -0.25)]
    ps = PauliStringSet.create(terms, dtype=F64)
    assert 1 < len(qwc_groups(ps.flips, ps.yz_masks)) < len(terms)
    v = _rand_state(3, 3)
    want = float(np.real(v.conj() @ _dense(terms) @ v))
    psi = cpx.from_complex(v, F64)
    est = float(stochastic_measure_strings(ps, psi, jax.random.PRNGKey(1),
                                           per_pauli=60000))
    assert abs(est - want) < 0.02, (est, want)
    # statistical sanity: independent keys scatter around the exact value
    ests = [float(stochastic_measure_strings(
        ps, psi, jax.random.PRNGKey(k), per_pauli=500)) for k in range(30)]
    assert abs(np.mean(ests) - want) < 5 * np.std(ests) / np.sqrt(30) + 0.02


def test_grouped_sampling_batched_states():
    terms = [("ZZ", -1.0), ("XX", 0.5), ("YI", 0.2)]
    ps = PauliStringSet.create(terms, dtype=F64)
    vs = np.stack([_rand_state(2, s) for s in range(3)])
    psi = cpx.from_complex(vs, F64)
    m = _dense(terms)
    want = np.real(np.einsum("bi,ij,bj->b", vs.conj(), m, vs))
    est = np.asarray(stochastic_measure_strings(
        ps, psi, jax.random.PRNGKey(2), per_pauli=40000))
    assert est.shape == (3,)
    np.testing.assert_allclose(est, want, atol=0.03)


@pytest.mark.slow
def test_sampled_mc_training_descends():
    """Hardware-realistic training through the grouped sampler: MC pulse
    gradients (stratified, variance-reduced) with finite-shot QWC-grouped
    Pauli measurement on a TFIM strings cost descend the exact energy —
    the sampled mode the round-2 per-term sampler made impractical for
    multi-group observables. (The full molecular pipeline is exercised by
    `demos/demo_hydrogen_chain.py --sampled`; its compile is too heavy
    for CPU CI.)"""
    import jax
    import optax
    from diffquantum_tpu.gradients.mc import mc_energy_grad_batch
    from diffquantum_tpu.models.tfim import build_tfim

    prob = build_tfim(6, J=1.0, h=1.0, n_basis=4, dense=False)
    n_steps = 10
    rng = np.random.default_rng(1)
    coeff = jnp.asarray(rng.standard_normal(
        prob.envelope.coeff_shape).astype(np.float32) * 0.1)

    def exact_energy(c):
        from diffquantum_tpu.dynamics.propagator import evolve
        psi = evolve(prob.ham, prob.envelope, c, prob.psi0, 0.0,
                     prob.T, horizon=prob.T, n_steps=n_steps,
                     t_sample="mid")
        return float(prob.measurement.strings.expectation(psi))

    opt = optax.adam(2e-2)
    state = opt.init(coeff)

    @jax.jit
    def step(c, st, k):
        g = mc_energy_grad_batch(prob.ham, prob.envelope, prob.measurement,
                                 c, prob.psi0, float(prob.T), k, n_steps,
                                 n_samples=4, strategy="stratified",
                                 sampling=True, per_pauli=200,
                                 t_sample="mid")
        updates, st = opt.update(g.astype(c.dtype), st, c)
        return optax.apply_updates(c, updates), st

    e0 = exact_energy(coeff)
    key = jax.random.PRNGKey(0)
    for _ in range(12):
        key, sub = jax.random.split(key)
        coeff, state = step(coeff, state, sub)
    e1 = exact_energy(coeff)
    assert np.isfinite(e1)
    assert e1 < e0 - 1e-3, (e0, e1)
