"""Sharded-state evolution with the CHUNKED local backend
(parallel/sharded_state.py::_evolve_sharded_chunked): each shard runs its
local Strang step through the chunked HBM-state engine, lifting the
per-shard ceiling to 22 local qubits (22 + log2(n_devices) total on a
mesh). Virtual-device interpret-mode coverage; the composition wraps
distributed rotations palindromically at half angles around the local
chunked step (second-order, O(dt^2) from the xla/fused ordering)."""
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

N = 12


def _problem(x_qubits, n=N, seed=0, coeff_scale=0.5):
    d = 2**n
    edges = [(i, (i + 1) % n) for i in range(n)]
    structure, omegas = [], []
    for (i, j) in edges:
        structure.append(TermStructure(
            kind="diag", diag=linalg.zz_diagonal(n, i, j)))
        omegas.append(np.pi)
    for q in x_qubits:
        structure.append(TermStructure(kind="1q", qubit=q, local=linalg.X))
        omegas.append(np.pi)
    ham = ControlledHamiltonian.create_structured(
        d, structure,
        h0_structure=TermStructure(kind="diag", diag=np.zeros(d)),
        dtype=jnp.float32)
    env = SimpleEnvelope(basis="legendre", n_basis=4,
                         omegas=tuple(float(w) for w in omegas))
    rng = np.random.default_rng(seed)
    coeff = jnp.asarray(rng.standard_normal(env.coeff_shape),
                        dtype=jnp.float32) * coeff_scale
    psi0 = cpx.from_complex(np.full(d, d ** -0.5, np.complex128),
                            dtype=jnp.float32)
    return ham, env, coeff, psi0, 1.5


def test_sharded_chunked_exact_no_distributed_drives():
    """With drives only on LOCAL qubits the chunked composition is
    identical to the single-device product engine (rotations on distinct
    qubits commute; diagonal phases are elementwise) — exact parity."""
    k = 1
    ham, env, coeff, psi0, T = _problem(x_qubits=range(k, N))
    mesh = make_mesh({"state": 2**k})
    out = evolve_product_sharded(ham, env, coeff, psi0, 0.0, T, horizon=T,
                                 n_steps=5, mesh=mesh,
                                 local_backend="chunked")
    ref = evolve_product(ham, env, coeff, psi0, 0.0, T, horizon=T,
                         n_steps=5)
    err = float(jnp.max(jnp.abs(out.re - ref.re) + jnp.abs(out.im - ref.im)))
    assert err < 5e-6, err


@pytest.mark.slow
def test_sharded_chunked_second_order_with_distributed_drives():
    """Drives on distributed qubits: the half-angle palindromic wrap is a
    different (still symmetric) composition. Against the 'xla' sharded
    path on the SAME grid (identical left-point envelope sampling, so the
    O(dt) sampling term cancels) the compositions differ by O(dt^2) per
    unit time — verify the ~4x decay — and both track the fine-grid
    dynamics."""
    ham, env, coeff, psi0, T = _problem(x_qubits=range(N), coeff_scale=0.8)
    mesh = make_mesh({"state": 4})

    def diff_at(ns):
        kw = dict(horizon=T, n_steps=ns, mesh=mesh)
        ck = evolve_product_sharded(ham, env, coeff, psi0, 0.0, T,
                                    local_backend="chunked", **kw)
        xl = evolve_product_sharded(ham, env, coeff, psi0, 0.0, T,
                                    local_backend="xla", **kw)
        return ck, float(jnp.max(jnp.abs(ck.re - xl.re)
                                 + jnp.abs(ck.im - xl.im)))

    _, e8 = diff_at(8)
    out16, e16 = diff_at(16)
    assert e16 < e8 / 2.5, (e8, e16)  # O(dt^2) composition difference
    # absolute accuracy vs fine-grid dynamics (dominated by the shared
    # O(dt) left-point envelope sampling, not the composition)
    exact = evolve_product(ham, env, coeff, psi0, 0.0, T, horizon=T,
                           n_steps=512)
    acc = float(jnp.max(jnp.abs(out16.re - exact.re)
                        + jnp.abs(out16.im - exact.im)))
    assert acc < 5e-2, acc


@pytest.mark.slow
def test_sharded_chunked_gradients():
    """Adjoint gradients through shard_map + per-step chunked custom VJP:
    finite-difference check on the spectral coefficients."""
    ham, env, coeff, psi0, T = _problem(x_qubits=range(N), seed=3)
    mesh = make_mesh({"state": 2})
    diag = jnp.asarray(np.random.default_rng(8).standard_normal(ham.dim),
                       jnp.float32)

    def energy(c):
        psi = evolve_product_sharded(ham, env, c, psi0, 0.0, T, horizon=T,
                                     n_steps=4, mesh=mesh,
                                     local_backend="chunked")
        return sharded_diag_expectation(psi, diag, mesh)

    v, g = jax.value_and_grad(energy)(coeff)
    assert np.isfinite(float(v))
    rng = np.random.default_rng(9)
    direction = jnp.asarray(rng.standard_normal(coeff.shape),
                            dtype=jnp.float32)
    eps = 1e-3
    fd = (float(energy(coeff + eps * direction))
          - float(energy(coeff - eps * direction))) / (2 * eps)
    an = float(jnp.sum(g * direction))
    assert abs(fd - an) < 5e-3 * max(1.0, abs(fd)), (fd, an)


def test_sharded_chunked_guards():
    ham, env, coeff, psi0, T = _problem(x_qubits=range(N))
    mesh = make_mesh({"state": 2})
    # non-two-valued diagonal control row -> not packable
    bad = ControlledHamiltonian.create_structured(
        ham.dim, ham.structure[:-1] + (TermStructure(
            kind="diag",
            diag=np.arange(ham.dim, dtype=np.float64) / ham.dim),),
        h0_structure=ham.h0_structure, dtype=jnp.float32)
    with pytest.raises(ValueError, match="two-valued"):
        evolve_product_sharded(bad, env, coeff, psi0, 0.0, T, horizon=T,
                               n_steps=2, mesh=mesh,
                               local_backend="chunked")
    # batched state unsupported
    psi_b = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), psi0)
    with pytest.raises(ValueError, match="unbatched"):
        evolve_product_sharded(ham, env, coeff, psi_b, 0.0, T, horizon=T,
                               n_steps=2, mesh=mesh, batch_axis=None,
                               local_backend="chunked")
