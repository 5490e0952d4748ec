"""Hop (XX+YY) drives on the streamed fused kernels: the ordered op plan
(`ops/fused_product.py::_plan_ops`) applies hops as masked {01,10}-subspace
rotations with in-kernel iota masks — values and custom-VJP gradients vs
the XLA product backend (which exponentiates hops in closed form,
`dynamics/product.py::apply_hop_rot`). This is what routes the MOLECULE
drive sets {X, Y, hop, ZZ} onto the fused engines (interpret mode on CPU;
real-chip coverage in tpu_tests)."""
import jax
import jax.numpy as jnp
import numpy as np

from diffquantum_tpu.dynamics.hamiltonian import (ControlledHamiltonian,
                                                  TermStructure)
from diffquantum_tpu.dynamics.product import (evolve_product,
                                              evolve_product_fused,
                                              fused_eligible)
from diffquantum_tpu.ops import cpx, linalg
from diffquantum_tpu.pulses.envelope import SimpleEnvelope
import pytest


def make_hop_problem(n, hop_pairs, with_xy=True, with_zz=True, seed=0,
                     n_basis=3):
    """Synthetic molecule-style drive set: optional X/Y per qubit (shares
    qubits with the hops → palindromic sub-steps), hop pairs, ZZ diags."""
    d = 2**n
    structure, omegas = [], []
    if with_xy:
        for q in range(n):
            for local in (linalg.X, linalg.Y):
                structure.append(TermStructure(kind="1q", qubit=q,
                                               local=local))
                omegas.append(np.pi)
    for (i, j) in hop_pairs:
        structure.append(TermStructure(kind="hop", qubit=i, qubit2=j))
        omegas.append(np.pi)
        if with_zz:
            structure.append(TermStructure(
                kind="diag", diag=linalg.zz_diagonal(n, i, j)))
            omegas.append(np.pi)
    ham = ControlledHamiltonian.create_structured(
        d, tuple(structure),
        h0_structure=TermStructure(kind="diag", diag=np.zeros(d)),
        dtype=jnp.float32)
    env = SimpleEnvelope(basis="bspline", n_basis=n_basis,
                         omegas=tuple(omegas))
    rng = np.random.default_rng(seed)
    coeff = jnp.asarray(
        rng.standard_normal(env.coeff_shape).astype(np.float32) * 0.4)
    psi0 = cpx.from_complex(linalg.uniform_superposition(n), jnp.float32)
    w = jnp.asarray(rng.standard_normal(d), jnp.float32)
    return ham, env, coeff, psi0, w


def _compare(n, hop_pairs, with_xy, n_steps=8, seed=0):
    ham, env, coeff, psi0, w = make_hop_problem(n, hop_pairs, with_xy,
                                                seed=seed)
    assert fused_eligible(ham)
    T = 2.0

    def loss(evolver):
        def f(c):
            psi = evolver(ham, env, c, psi0, 0.0, T, horizon=T,
                          n_steps=n_steps)
            return jnp.sum(cpx.abs2(psi) * w, axis=-1)
        return f

    vf, gf = jax.value_and_grad(loss(evolve_product_fused))(coeff)
    vx, gx = jax.value_and_grad(loss(evolve_product))(coeff)
    np.testing.assert_allclose(float(vf), float(vx), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=1e-3, atol=1e-5)


def test_hop_row_row_pair():
    """Both hop bits on row qubits (10q: qubits 0-2 are rows)."""
    _compare(10, [(0, 1)], with_xy=False, seed=1)


def test_hop_lane_lane_pair():
    """Both hop bits on lane qubits — one combined XOR-perm matmul."""
    _compare(10, [(7, 9)], with_xy=False, seed=2)


def test_hop_row_lane_pair():
    """Hop straddling the row/lane split — flip + perm composition."""
    _compare(10, [(1, 8)], with_xy=False, seed=3)


@pytest.mark.slow
def test_hop_with_xy_palindromic():
    """The molecule shape: X/Y on every qubit + hop chain + ZZ — shared
    qubits force the palindromic half-angle op sequence."""
    _compare(10, [(i, i + 1) for i in range(9)], with_xy=True, seed=4)


@pytest.mark.slow
def test_hop_11q_asymmetric_rows():
    """11 qubits (R = 16): odd split, hops at both boundaries."""
    _compare(11, [(0, 3), (3, 10)], with_xy=True, seed=5)


@pytest.mark.slow
def test_hop_batched_seeds():
    """Per-seed batched kernels with hops: grads of the summed energy."""
    n, n_steps, b = 10, 6, 3
    ham, env, coeff, psi0, w = make_hop_problem(
        n, [(i, i + 1) for i in range(0, 8, 2)], with_xy=True, seed=6)
    assert fused_eligible(ham)
    rng = np.random.default_rng(7)
    coeffs = jnp.asarray(
        rng.standard_normal((b,) + env.coeff_shape).astype(np.float32)
        * 0.3)
    batch = jax.tree_util.tree_map(lambda x: jnp.stack([x] * b), psi0)
    T = 2.0

    def loss(evolver, batched):
        def f(cs):
            if batched:
                psi = evolver(ham, env, cs, batch, 0.0, T, horizon=T,
                              n_steps=n_steps)
                return jnp.sum(cpx.abs2(psi) * w)
            e = jax.vmap(lambda c, p: jnp.sum(cpx.abs2(
                evolver(ham, env, c, p, 0.0, T, horizon=T,
                        n_steps=n_steps)) * w))(cs, batch)
            return jnp.sum(e)
        return f

    vf, gf = jax.value_and_grad(loss(evolve_product_fused, True))(coeffs)
    vx, gx = jax.value_and_grad(loss(evolve_product, False))(coeffs)
    np.testing.assert_allclose(float(vf), float(vx), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=1e-3, atol=1e-5)


def test_hop_eligibility_rules():
    """Hops are fused-eligible at EVERY size the engines cover: streamed
    ≤17q, packed 18q, and (round 4) the palindromic-schedule mega engine
    at 19-24q when a feasible chunk layout exists
    (tests/test_router.py pins the full regime table)."""
    from diffquantum_tpu.dynamics.product import select_engine

    ham, *_ = make_hop_problem(10, [(0, 9)])
    assert fused_eligible(ham)
    e18, *_ = make_hop_problem(18, [(0, 17)], with_xy=False, with_zz=False)
    assert fused_eligible(e18)  # round-4: packed kernels carry hops at 18q
    big, *_ = make_hop_problem(19, [(0, 18)], with_xy=False, with_zz=False)
    assert fused_eligible(big)  # round-4: hop mega engine at 19-24q
    assert select_engine(big) == "mega_hop"
    # (the 24/25-qubit architectural boundary is pinned in
    # tests/test_router.py::test_out_of_band_sizes)


def _force_packed(monkeypatch):
    import diffquantum_tpu.dynamics.product as dp
    monkeypatch.setattr(dp, "_PACKED_MIN_QUBITS", 0)


def test_hop_packed_row_lane_pairs(monkeypatch):
    """Hops on the PACKED-phase kernels (the 18q form, router forced to
    exercise it at 10q): row/row, row/lane and lane/lane pairs through the
    ordered op plan + in-kernel packed phases."""
    _force_packed(monkeypatch)
    _compare(10, [(0, 1), (1, 8), (7, 9)], with_xy=False, seed=8)


@pytest.mark.slow
def test_hop_packed_molecule_shape(monkeypatch):
    """The molecule drive set {X, Y, hop, ZZ} on the packed kernels —
    shared qubits force the palindromic op sequence through the packed
    form's ordered plan."""
    _force_packed(monkeypatch)
    _compare(10, [(i, i + 1) for i in range(9)], with_xy=True, seed=9)


@pytest.mark.slow
def test_hop_packed_batched_seeds(monkeypatch):
    """Per-seed batched PACKED kernels with hops."""
    _force_packed(monkeypatch)
    n, n_steps, b = 10, 6, 3
    ham, env, coeff, psi0, w = make_hop_problem(
        n, [(1, 2), (5, 9)], with_xy=True, seed=10)
    assert fused_eligible(ham)
    rng = np.random.default_rng(11)
    coeffs = jnp.asarray(
        rng.standard_normal((b,) + env.coeff_shape).astype(np.float32)
        * 0.3)
    batch = jax.tree_util.tree_map(lambda x: jnp.stack([x] * b), psi0)
    T = 2.0

    def loss_f(cs):
        psi = evolve_product_fused(ham, env, cs, batch, 0.0, T, horizon=T,
                                   n_steps=n_steps)
        return jnp.sum(cpx.abs2(psi) * w)

    def loss_x(cs):
        e = jax.vmap(lambda c, p: jnp.sum(cpx.abs2(
            evolve_product(ham, env, c, p, 0.0, T, horizon=T,
                           n_steps=n_steps)) * w))(cs, batch)
        return jnp.sum(e)

    vf, gf = jax.value_and_grad(loss_f)(coeffs)
    vx, gx = jax.value_and_grad(loss_x)(coeffs)
    np.testing.assert_allclose(float(vf), float(vx), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=1e-3, atol=1e-5)


def test_streamed_capacity_guard_hop_free():
    """A hop-free streamed-size drive set whose palindromic op sequence
    overflows the 128 angle lanes must fall back to the product backend
    (fused_eligible False) instead of crashing at trace time."""
    n = 10
    d = 2**n
    structure, omegas = [], []
    for rep in range(7):  # 7 X + 7 Y per qubit = 140 shared-qubit rots
        for q in range(n):
            for local in (linalg.X, linalg.Y):
                structure.append(TermStructure(kind="1q", qubit=q,
                                               local=local))
                omegas.append(np.pi)
    ham = ControlledHamiltonian.create_structured(
        d, tuple(structure),
        h0_structure=TermStructure(kind="diag", diag=np.zeros(d)),
        dtype=jnp.float32)
    assert not fused_eligible(ham)
