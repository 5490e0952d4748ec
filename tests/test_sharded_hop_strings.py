"""Round-4 SPMD breadth: hop (XX+YY) and channel (carrier) drives on the
state-sharded engine, and sharded Pauli-string measurement — vs the
single-device oracles on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from diffquantum_tpu.dynamics.hamiltonian import (ControlledHamiltonian,
                                                  TermStructure)
from diffquantum_tpu.dynamics.product import evolve_product
from diffquantum_tpu.measure import PauliStringSet
from diffquantum_tpu.ops import cpx, linalg
from diffquantum_tpu.parallel.mesh import make_mesh
from diffquantum_tpu.parallel.sharded_state import (
    evolve_product_sharded, sharded_diag_expectation,
    sharded_strings_expectation)
from diffquantum_tpu.pulses.envelope import ChannelEnvelope, SimpleEnvelope


def _hop_ham(n, hop_pairs, with_xy=True):
    d = 2**n
    structure, omegas = [], []
    if with_xy:
        for q in range(n):
            structure.append(TermStructure(kind="1q", qubit=q,
                                           local=linalg.X))
            omegas.append(np.pi)
    for (i, j) in hop_pairs:
        structure.append(TermStructure(kind="hop", qubit=i, qubit2=j))
        omegas.append(np.pi)
        structure.append(TermStructure(kind="diag",
                                       diag=linalg.zz_diagonal(n, i, j)))
        omegas.append(np.pi)
    ham = ControlledHamiltonian.create_structured(
        d, tuple(structure),
        h0_structure=TermStructure(kind="diag", diag=np.zeros(d)),
        dtype=jnp.float32)
    return ham, omegas


def test_sharded_hop_drives_match_product():
    """Hops across every shard relation — both-distributed (0,1),
    mixed (1,5), both-local (4,6) — on a 4-way state mesh, with X drives
    sharing qubits (palindromic order). The sharded step uses the same op
    ordering as evolve_product's Strang step, so values and adjoint
    gradients must match to fp tolerance."""
    n = 8
    ham, omegas = _hop_ham(n, [(0, 1), (1, 5), (4, 6)])
    env = SimpleEnvelope(basis="bspline", n_basis=3,
                         omegas=tuple(float(w) for w in omegas))
    rng = np.random.default_rng(0)
    coeff = jnp.asarray(rng.standard_normal(env.coeff_shape),
                        jnp.float32) * 0.4
    psi0 = cpx.from_complex(linalg.uniform_superposition(n), jnp.float32)
    w = jnp.asarray(rng.standard_normal(2**n), jnp.float32)
    mesh = make_mesh({"state": 4})
    T, n_steps = 1.5, 6

    def f_sharded(c):
        psi = evolve_product_sharded(ham, env, c, psi0, 0.0, T, horizon=T,
                                     n_steps=n_steps, mesh=mesh)
        return sharded_diag_expectation(psi, w, mesh)

    def f_ref(c):
        psi = evolve_product(ham, env, c, psi0, 0.0, T, horizon=T,
                             n_steps=n_steps)
        return jnp.sum(cpx.abs2(psi) * w, axis=-1)

    with mesh:
        vs, gs = jax.value_and_grad(f_sharded)(coeff)
    vr, gr = jax.value_and_grad(f_ref)(coeff)
    np.testing.assert_allclose(float(vs), float(vr), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gr),
                               rtol=1e-3, atol=1e-5)


def test_sharded_channel_envelope_match_product():
    """The carrier/two-quadrature (IBM-pulse-style) envelope drives the
    SHARDED engine unchanged — the envelope is an array program feeding
    the same amplitude interface."""
    n = 8
    d = 2**n
    structure, nested = [], []
    for idx, q in enumerate(range(n)):
        structure.append(TermStructure(kind="1q", qubit=q, local=linalg.X))
        nested.append([[0.0, np.pi, 0.5 * idx, idx]])
    structure.append(TermStructure(
        kind="diag", diag=linalg.zz_diagonal(n, 0, 1)))
    nested.append([[0.0, np.pi, 1.3, n]])
    ham = ControlledHamiltonian.create_structured(
        d, tuple(structure),
        h0_structure=TermStructure(kind="diag", diag=np.zeros(d)),
        dtype=jnp.float32)
    env = ChannelEnvelope.from_rows(nested, n_basis=3, func_type=0)
    rng = np.random.default_rng(1)
    vv = jnp.asarray(rng.standard_normal(env.coeff_shape),
                     jnp.float32) * 0.4
    psi0 = cpx.from_complex(linalg.uniform_superposition(n), jnp.float32)
    w = jnp.asarray(rng.standard_normal(d), jnp.float32)
    mesh = make_mesh({"state": 2})
    T, n_steps = 1.0, 5

    def f_sharded(c):
        psi = evolve_product_sharded(ham, env, c, psi0, 0.0, T, horizon=T,
                                     n_steps=n_steps, mesh=mesh)
        return sharded_diag_expectation(psi, w, mesh)

    def f_ref(c):
        psi = evolve_product(ham, env, c, psi0, 0.0, T, horizon=T,
                             n_steps=n_steps)
        return jnp.sum(cpx.abs2(psi) * w, axis=-1)

    with mesh:
        vs, gs = jax.value_and_grad(f_sharded)(vv)
    vr, gr = jax.value_and_grad(f_ref)(vv)
    np.testing.assert_allclose(float(vs), float(vr), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gr),
                               rtol=1e-3, atol=1e-5)


def test_sharded_strings_expectation():
    """Sharded Pauli-sum measurement: terms spanning distributed-only,
    local-only, and mixed flips with X/Y/Z letters, vs the single-device
    PauliStringSet oracle; batched states too."""
    n = 8
    d = 2**n
    terms = [("XXIIIIII", -0.7),   # flip on distributed qubits only
             ("IIIIZZII", 0.9),    # diagonal, local
             ("XYIIIXZI", 0.5),    # mixed dist/local flips + Y sign
             ("ZIIIIIIY", -1.1),
             ("IIIIIIII", 0.3)]
    strings = PauliStringSet.create(terms)
    rng = np.random.default_rng(2)
    vec = rng.standard_normal(d) + 1j * rng.standard_normal(d)
    vec /= np.linalg.norm(vec)
    psi = cpx.from_complex(vec, jnp.float32)
    mesh = make_mesh({"state": 4})

    ref = float(strings.expectation(psi))
    with mesh:
        out = float(sharded_strings_expectation(psi, strings, mesh))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    # batched: [3, d] states sharded over (batch implicit None, state)
    vecs = rng.standard_normal((3, d)) + 1j * rng.standard_normal((3, d))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    psib = cpx.from_complex(vecs, jnp.float32)
    refb = np.asarray(strings.expectation(psib))
    with mesh:
        outb = np.asarray(sharded_strings_expectation(psib, strings, mesh))
    np.testing.assert_allclose(outb, refb, rtol=1e-5, atol=1e-6)


def _fused_hop_setup(n, hop_pairs, x_qubits, y_qubits=(), n_basis=3,
                     seed=3, scale=0.4, basis="bspline"):
    d = 2**n
    structure, omegas = [], []
    for q in x_qubits:
        structure.append(TermStructure(kind="1q", qubit=q, local=linalg.X))
        omegas.append(np.pi)
    for q in y_qubits:
        structure.append(TermStructure(kind="1q", qubit=q, local=linalg.Y))
        omegas.append(np.pi)
    for (i, j) in hop_pairs:
        structure.append(TermStructure(kind="hop", qubit=i, qubit2=j))
        omegas.append(np.pi)
        structure.append(TermStructure(kind="diag",
                                       diag=linalg.zz_diagonal(n, i, j)))
        omegas.append(np.pi)
    ham = ControlledHamiltonian.create_structured(
        d, tuple(structure),
        h0_structure=TermStructure(kind="diag", diag=np.zeros(d)),
        dtype=jnp.float32)
    env = SimpleEnvelope(basis=basis, n_basis=n_basis,
                         omegas=tuple(float(w) for w in omegas))
    rng = np.random.default_rng(seed)
    coeff = jnp.asarray(rng.standard_normal(env.coeff_shape),
                        jnp.float32) * scale
    psi0 = cpx.from_complex(linalg.uniform_superposition(n), jnp.float32)
    w = jnp.asarray(rng.standard_normal(d), jnp.float32)
    return ham, env, coeff, psi0, w


def test_sharded_fused_hops_exact_commuting():
    """Hops on the sharded FUSED local backend (round 5 — round 4 forced
    every hop drive set onto local_backend='xla'): with all ops on
    DISTINCT qubits every factor commutes, so sharded-fused ≡ sharded-xla
    ≡ single-device product EXACTLY at finite dt — values and adjoint
    gradients. Hop relations covered: boundary-straddling (0, 5) and
    shard-local (6, 7) on a 2-way state mesh (k=1, 10 local qubits)."""
    n = 11
    ham, env, coeff, psi0, w = _fused_hop_setup(
        n, hop_pairs=[(0, 5), (6, 7)], x_qubits=(1, 2), y_qubits=(3,))
    mesh = make_mesh({"state": 2})
    T, n_steps = 1.0, 4

    def f_sh(backend):
        def f(c):
            psi = evolve_product_sharded(
                ham, env, c, psi0, 0.0, T, horizon=T, n_steps=n_steps,
                mesh=mesh, local_backend=backend)
            return sharded_diag_expectation(psi, w, mesh)
        return f

    def f_ref(c):
        psi = evolve_product(ham, env, c, psi0, 0.0, T, horizon=T,
                             n_steps=n_steps)
        return jnp.sum(cpx.abs2(psi) * w, axis=-1)

    with mesh:
        vf, gf = jax.value_and_grad(f_sh("fused"))(coeff)
        vx, gx = jax.value_and_grad(f_sh("xla"))(coeff)
    vr, gr = jax.value_and_grad(f_ref)(coeff)
    np.testing.assert_allclose(float(vf), float(vr), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(vx), float(vr), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gr),
                               rtol=1e-3, atol=1e-5)


def test_sharded_fused_hops_molecule_second_order():
    """The non-commuting molecule shape (X+Y on every qubit sharing sites
    with a hop chain) on the sharded FUSED backend: a different 2nd-order
    integrator than evolve_product (the distributed ops wrap the local
    kernel palindromically), so exactness is asserted as second-order
    convergence to a fine-grid reference, plus a finite-difference
    gradient probe THROUGH the sharded fused path (adjoint exactness is
    independent of the splitting order)."""
    n = 11
    qs = tuple(range(n))
    ham, env, coeff, psi0, w = _fused_hop_setup(
        n, hop_pairs=[(i, i + 1) for i in range(n - 1)], x_qubits=qs,
        y_qubits=qs, basis="poly", n_basis=1, scale=0.5, seed=4)
    mesh = make_mesh({"state": 2})
    T = 1.0

    def final(n_steps):
        with mesh:
            return evolve_product_sharded(
                ham, env, coeff, psi0, 0.0, T, horizon=T, n_steps=n_steps,
                mesh=mesh, local_backend="fused")

    ref = evolve_product(ham, env, coeff, psi0, 0.0, T, horizon=T,
                         n_steps=64)

    def err(psi):
        return float(jnp.max(jnp.abs(psi.re - ref.re))
                     + jnp.max(jnp.abs(psi.im - ref.im)))

    out8 = final(8)
    assert abs(float(cpx.norm2(out8)) - 1.0) < 1e-4
    e8, e16 = err(out8), err(final(16))
    assert e16 < e8 / 2.8, (e8, e16)  # ~4x for a 2nd-order scheme

    def loss(c):
        psi = evolve_product_sharded(
            ham, env, c, psi0, 0.0, T, horizon=T, n_steps=3, mesh=mesh,
            local_backend="fused")
        return sharded_diag_expectation(psi, w, mesh)

    with mesh:
        v0, g = jax.value_and_grad(loss)(coeff)
        rng = np.random.default_rng(5)
        dirn = jnp.asarray(rng.standard_normal(coeff.shape),
                           jnp.float32)
        eps = 1e-3
        fd = (float(loss(coeff + eps * dirn))
              - float(loss(coeff - eps * dirn))) / (2 * eps)
    an = float(jnp.sum(g * dirn))
    assert np.isfinite(float(v0))
    assert abs(fd - an) < 5e-3 * max(1.0, abs(fd)), (fd, an)
