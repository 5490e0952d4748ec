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
