"""SPMD story for the fused kernel: per-step Pallas local-rotation blocks
inside shard_map, with diagonal phases and distributed-qubit rotations in
XLA (ppermute). Must match the XLA sharded path (same math, fp-reorder
tolerance) including gradients through the custom-VJP kernel.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffquantum_tpu.dynamics.hamiltonian import (ControlledHamiltonian,
                                                  TermStructure)
from diffquantum_tpu.dynamics.product import evolve_product
from diffquantum_tpu.ops import cpx, linalg
from diffquantum_tpu.parallel.mesh import make_mesh
from diffquantum_tpu.parallel.sharded_state import (
    evolve_product_sharded, sharded_diag_expectation)
from diffquantum_tpu.pulses.envelope import SimpleEnvelope

N = 11  # 2 state shards -> 10 local qubits (kernel minimum)


def _problem(dup_local=False):
    d = 2**N
    edges = [(i, (i + 1) % N) for i in range(N)]
    structure, omegas = [], []
    for (i, j) in edges:
        structure.append(TermStructure(
            kind="diag", diag=linalg.zz_diagonal(N, i, j)))
        omegas.append(np.pi)
    for q in range(N):
        structure.append(TermStructure(kind="1q", qubit=q, local=linalg.X))
        omegas.append(np.pi)
    if dup_local:
        # non-commuting same-qubit pair on a LOCAL qubit (q=5 >= k=1)
        structure.append(TermStructure(kind="1q", qubit=5, local=linalg.Y))
        omegas.append(np.pi)
    ham = ControlledHamiltonian.create_structured(
        d, structure,
        h0_structure=TermStructure(kind="diag", diag=np.zeros(d)),
        dtype=jnp.float32)
    env = SimpleEnvelope(basis="legendre", n_basis=4,
                         omegas=tuple(float(w) for w in omegas))
    rng = np.random.default_rng(0)
    coeff = jnp.asarray(rng.standard_normal(env.coeff_shape),
                        dtype=jnp.float32) * 0.5
    psi0 = cpx.from_complex(np.full(d, d ** -0.5, np.complex128),
                            dtype=jnp.float32)
    return ham, env, coeff, psi0, 1.5


@pytest.mark.parametrize("dup_local", [False, True])
@pytest.mark.slow
def test_sharded_fused_matches_xla(dup_local):
    ham, env, coeff, psi0, T = _problem(dup_local)
    mesh = make_mesh({"state": 2})
    n_steps = 6
    kw = dict(horizon=T, n_steps=n_steps, mesh=mesh)
    ref = evolve_product_sharded(ham, env, coeff, psi0, 0.0, T,
                                 local_backend="xla", **kw)
    fus = evolve_product_sharded(ham, env, coeff, psi0, 0.0, T,
                                 local_backend="fused", **kw)
    err = float(jnp.max(jnp.abs(ref.re - fus.re) + jnp.abs(ref.im - fus.im)))
    assert err < 5e-6, err
    # also against the single-device product engine
    loc = evolve_product(ham, env, coeff, psi0, 0.0, T, horizon=T,
                         n_steps=n_steps)
    err2 = float(jnp.max(jnp.abs(loc.re - fus.re)
                         + jnp.abs(loc.im - fus.im)))
    assert err2 < 5e-6, err2


@pytest.mark.slow
def test_sharded_fused_gradients_match():
    """Adjoint through shard_map + the kernel's custom VJP must equal the
    XLA sharded path's gradient."""
    ham, env, coeff, psi0, T = _problem()
    mesh = make_mesh({"state": 2})
    n_steps = 5
    # a generic (asymmetric) observable — a symmetric one makes the energy
    # vanish at this coeff and the comparison would be f32 noise vs noise
    diag = jnp.asarray(np.random.default_rng(8).standard_normal(ham.dim),
                       jnp.float32)

    def energy(backend):
        def f(c):
            psi = evolve_product_sharded(
                ham, env, c, psi0, 0.0, T, horizon=T, n_steps=n_steps,
                mesh=mesh, local_backend=backend)
            return sharded_diag_expectation(psi, diag, mesh)
        return f

    vx, gx = jax.value_and_grad(energy("xla"))(coeff)
    vf, gf = jax.value_and_grad(energy("fused"))(coeff)
    np.testing.assert_allclose(float(vf), float(vx), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=2e-3, atol=2e-5)


@pytest.mark.slow
def test_sharded_fused_seed_batch():
    """data x state mesh, per-seed coefficients, fused local blocks."""
    ham, env, coeff, psi0, T = _problem()
    mesh = make_mesh({"data": 2, "state": 2})
    n_steps = 4
    rng = np.random.default_rng(4)
    coeffs = jnp.asarray(rng.standard_normal((2,) + env.coeff_shape),
                         dtype=jnp.float32) * 0.5
    psi_b = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), psi0)
    kw = dict(horizon=T, n_steps=n_steps, mesh=mesh, batch_axis="data")
    ref = evolve_product_sharded(ham, env, coeffs, psi_b, 0.0, T,
                                 local_backend="xla", **kw)
    fus = evolve_product_sharded(ham, env, coeffs, psi_b, 0.0, T,
                                 local_backend="fused", **kw)
    err = float(jnp.max(jnp.abs(ref.re - fus.re) + jnp.abs(ref.im - fus.im)))
    assert err < 5e-6, err


def test_sharded_fused_eligibility_guard():
    ham, env, coeff, psi0, T = _problem()
    mesh = make_mesh({"state": 2})
    ham64 = ControlledHamiltonian.create_structured(
        ham.dim, ham.structure, h0_structure=ham.h0_structure,
        dtype=jnp.float64)
    with pytest.raises(ValueError, match="fused"):
        evolve_product_sharded(ham64, env, coeff.astype(jnp.float64),
                               psi0.astype(jnp.float64), 0.0, T, horizon=T,
                               n_steps=4, mesh=mesh, local_backend="fused")
