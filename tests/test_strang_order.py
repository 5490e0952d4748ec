"""Splitting-order tests for same-qubit non-commuting drives (X + Y).

The Strang split's second-order claim (`dynamics/product.py`) assumed all 1q
terms act on distinct qubits; two drives on the SAME qubit (the two-quadrature
X+Y pair that `models/control.py` uses) are non-commuting, and a naive
sequential sub-step product degrades to first order. The palindromic ordering
(`product._symmetrize_rots` / the half-forward + half-reversed sweep) restores
O(dt^2) — these tests measure the order against the dense piecewise-constant
oracle (exact per-step expm on the SAME grid, so the difference is pure
splitting error).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffquantum_tpu.dynamics.hamiltonian import (ControlledHamiltonian,
                                                  TermStructure)
from diffquantum_tpu.dynamics.product import (evolve_product,
                                              evolve_product_fused,
                                              split_structure)
from diffquantum_tpu.dynamics.propagator import evolve
from diffquantum_tpu.ops import cpx, linalg
from diffquantum_tpu.pulses.envelope import SimpleEnvelope


def _xy_problem(n, xy_qubit, dtype, extra_x=()):
    """n-qubit ring-ZZ diag control + X and Y drives on ONE qubit (plus
    optional X drives on other qubits). Returns (ham_struct, ham_dense,
    envelope, psi0, T, coeff)."""
    d = 2**n
    edges = [(i, (i + 1) % n) for i in range(n)]
    structure, Hs, omegas = [], [], []
    for (i, j) in edges:
        diag = linalg.zz_diagonal(n, i, j)
        structure.append(TermStructure(kind="diag", diag=diag))
        Hs.append(np.diag(diag).astype(np.complex128))
        omegas.append(np.pi)
    for g, name in ((linalg.X, "x"), (linalg.Y, "y")):
        structure.append(TermStructure(kind="1q", qubit=xy_qubit, local=g))
        Hs.append(linalg.op_on_qubits(g, [xy_qubit], n))
        omegas.append(np.pi)
    for q in extra_x:
        structure.append(TermStructure(kind="1q", qubit=q, local=linalg.X))
        Hs.append(linalg.op_on_qubits(linalg.X, [q], n))
        omegas.append(np.pi)
    h0 = TermStructure(kind="diag", diag=np.zeros(d))
    ham_s = ControlledHamiltonian.create_structured(
        d, structure, h0_structure=h0, dtype=dtype)
    ham_d = ControlledHamiltonian.create(
        np.zeros((d, d)), Hs, dtype=dtype, structure=structure,
        h0_structure=h0)
    env = SimpleEnvelope(basis="legendre", n_basis=4,
                         omegas=tuple(float(w) for w in omegas))
    rng = np.random.default_rng(7)
    coeff = jnp.asarray(rng.standard_normal(env.coeff_shape), dtype=dtype)
    psi0 = cpx.from_complex(
        np.full(d, 1 / np.sqrt(d), dtype=np.complex128), dtype=dtype)
    return ham_s, ham_d, env, psi0, 1.5, coeff


def _err(a, b):
    return float(jnp.max(jnp.sqrt((a.re - b.re) ** 2 + (a.im - b.im) ** 2)))


def test_same_qubit_xy_second_order():
    """Global splitting error vs the dense same-grid oracle must shrink ~4x
    when n_steps doubles (O(dt^2)). Before the palindromic fix the ratio was
    ~2 (first order)."""
    ham_s, ham_d, env, psi0, T, coeff = _xy_problem(3, 1, jnp.float64)
    errs = []
    for n_steps in (16, 32, 64):
        dense = evolve(ham_d, env, coeff, psi0, 0.0, T, horizon=T,
                       n_steps=n_steps, backend="expm")
        prod = evolve_product(ham_s, env, coeff, psi0, 0.0, T, horizon=T,
                              n_steps=n_steps)
        errs.append(_err(dense, prod))
    r1 = errs[0] / errs[1]
    r2 = errs[1] / errs[2]
    assert 3.0 < r1 < 5.5, (errs, r1)
    assert 3.0 < r2 < 5.5, (errs, r2)


@pytest.mark.slow
def test_same_qubit_xy_fused_matches_xla_product():
    """The fused kernel's symmetrized rotation list must reproduce the XLA
    palindromic product (same splitting → tight f32 agreement), including
    gradients."""
    ham_s, _, env, psi0, T, coeff = _xy_problem(
        10, 3, jnp.float32, extra_x=(0, 6, 9))
    n_steps = 12

    def e_fused(c):
        psi = evolve_product_fused(ham_s, env, c, psi0, 0.0, T, horizon=T,
                                   n_steps=n_steps)
        return jnp.sum(cpx.abs2(psi) * jnp.arange(ham_s.dim, dtype=psi.re.dtype))

    def e_xla(c):
        psi = evolve_product(ham_s, env, c, psi0, 0.0, T, horizon=T,
                             n_steps=n_steps)
        return jnp.sum(cpx.abs2(psi) * jnp.arange(ham_s.dim, dtype=psi.re.dtype))

    c32 = coeff.astype(jnp.float32)
    vf, gf = jax.value_and_grad(e_fused)(c32)
    vx, gx = jax.value_and_grad(e_xla)(c32)
    np.testing.assert_allclose(float(vf), float(vx), rtol=2e-5)
    # atol floor: near-zero gradient rows carry f32 accumulation noise of
    # order eps * |value| (~3e-5 here); large rows agree to ~1e-5 relative
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=1e-3, atol=5e-4)


def test_same_qubit_xy_sharded_matches_product():
    """Sharded engine with the X+Y pair on a DISTRIBUTED qubit matches the
    single-device palindromic product."""
    from diffquantum_tpu.parallel.mesh import make_mesh
    from diffquantum_tpu.parallel.sharded_state import evolve_product_sharded

    ham_s, _, env, psi0, T, coeff = _xy_problem(4, 0, jnp.float64,
                                                extra_x=(2,))
    mesh = make_mesh({"state": 2})
    n_steps = 20
    ref = evolve_product(ham_s, env, coeff, psi0, 0.0, T, horizon=T,
                         n_steps=n_steps)
    sh = evolve_product_sharded(ham_s, env, coeff, psi0, 0.0, T, horizon=T,
                                n_steps=n_steps, mesh=mesh)
    assert _err(ref, sh) < 1e-12


def test_split_structure_rejects_non_involutory():
    """ADVICE r1: non-diagonal non-involutory 1q generators (sigma+) must
    raise, not silently produce a non-unitary propagator. DIAGONAL locals
    (projectors, Z) are fine: they fold into the commuting phase block,
    where exp(-i th diag) is exact for ANY real diagonal."""
    d = 4
    sp = np.array([[0.0, 1.0], [0.0, 0.0]])  # sigma+ — not involutory
    structure = (TermStructure(kind="1q", qubit=0, local=sp),)
    ham = ControlledHamiltonian.create_structured(
        d, structure, h0_structure=TermStructure(kind="diag",
                                                 diag=np.zeros(d)))
    with pytest.raises(ValueError, match="involutory"):
        split_structure(ham)

    # a diagonal projector is legal now — and EXACT via the phase block
    proj = np.array([[0.0, 0.0], [0.0, 1.0]])
    structure = (TermStructure(kind="1q", qubit=0, local=proj),)
    ham_p = ControlledHamiltonian.create_structured(
        d, structure, h0_structure=TermStructure(kind="diag",
                                                 diag=np.zeros(d)))
    diag_idx, diag_rows, *_ = split_structure(ham_p)
    assert diag_idx == [0]
    np.testing.assert_allclose(diag_rows[0], [0.0, 0.0, 1.0, 1.0])
