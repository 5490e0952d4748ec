"""Packed-phase fused kernels: in-kernel diagonal phases from one int32
sign bit-plane (ops/fused_product.py packed variants) vs the XLA product
backend — decomposition unit tests, 10q parity, the 18-19 qubit sizes the
streamed kernels could not fit, and the streamed fallback for non-packable
diagonals (interpret mode on CPU; real-chip coverage in tpu_tests)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffquantum_tpu.dynamics.hamiltonian import (ControlledHamiltonian,
                                                  TermStructure)
from diffquantum_tpu.dynamics.product import (evolve_product,
                                              evolve_product_fused,
                                              fused_eligible)
from diffquantum_tpu.models import maxcut
from diffquantum_tpu.ops import cpx, linalg
from diffquantum_tpu.ops.fused_product import pack_diag_signs
from diffquantum_tpu.pulses.envelope import SimpleEnvelope


def test_pack_diag_signs_decomposition():
    rows = [np.array([1.0, -1.0, -1.0, 1.0]),     # Pauli ZZ: c=0, w=1
            np.array([0.0, 1.0, 0.0, 1.0]),       # number op: c=w=0.5
            np.array([3.0, 3.0, 3.0, 3.0])]       # constant: w=0
    out = pack_diag_signs(rows)
    assert out is not None
    signs, consts, scales = out
    assert signs.shape == (1, 4)
    np.testing.assert_allclose(consts, [0.0, 0.5, 3.0])
    np.testing.assert_allclose(scales, [1.0, 0.5, 0.0])
    # reconstruct each row from c + w * (1 - 2*bit)
    for k, row in enumerate(rows):
        s = 1.0 - 2.0 * ((signs[k // 30] >> (k % 30)) & 1)
        np.testing.assert_allclose(consts[k] + scales[k] * s, row)


def test_pack_diag_signs_multi_plane():
    """>30 rows spill into a second int32 bit-plane (the 20q-molecule
    shape: 37 ZZ couplers — past the single-plane budget of round 3)."""
    rng = np.random.default_rng(0)
    rows = [np.where(rng.random(8) < 0.5, -1.0, 1.0) for _ in range(37)]
    signs, consts, scales = pack_diag_signs(rows)
    assert signs.shape == (2, 8)
    for k, row in enumerate(rows):
        s = 1.0 - 2.0 * ((signs[k // 30] >> (k % 30)) & 1)
        np.testing.assert_allclose(consts[k] + scales[k] * s, row)


def test_pack_diag_signs_rejects():
    assert pack_diag_signs([np.array([0.0, 1.0, 2.0, 1.0])]) is None
    many = [np.array([1.0, -1.0])] * 121
    assert pack_diag_signs(many) is None
    signs, consts, scales = pack_diag_signs([])
    assert signs.size == 0 and consts.size == 0


def _loss_fns(prob, n_steps):
    def f(evolver):
        def loss(c):
            psi = evolver(prob.ham, prob.envelope, c, prob.psi0, 0.0,
                          prob.T, horizon=prob.T, n_steps=n_steps)
            return jnp.sum(cpx.abs2(psi) * prob.measurement.diag, axis=-1)
        return loss
    return f(evolve_product_fused), f(evolve_product)


@pytest.mark.parametrize("n", [18, 19])
@pytest.mark.slow
def test_packed_18_19q_matches_xla(n):
    """The sizes past the streamed kernels' VMEM wall: 18q = packed
    phases + HBM-resident boundary buffers in the VMEM kernel, 19q =
    the chunked HBM-state engine (boundary DMA is a no-op in interpret
    mode on CPU; the real-chip paths are covered by tpu_tests)."""
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4,
                               dense=False)
    assert fused_eligible(prob.ham)
    rng = np.random.default_rng(n)
    coeff = jnp.asarray(
        rng.standard_normal(prob.envelope.coeff_shape).astype(np.float32)
        * 0.3)
    n_steps = 4
    loss_f, loss_x = _loss_fns(prob, n_steps)
    v_f, g_f = jax.value_and_grad(loss_f)(coeff)
    v_x, g_x = jax.value_and_grad(loss_x)(coeff)
    assert abs(float(v_f) - float(v_x)) < 1e-5
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x),
                               rtol=2e-3, atol=2e-5)


def _custom_problem(rows_fn, n=10):
    """10q problem with custom diagonal control rows + X drives."""
    d = 2**n
    structure = [TermStructure(kind="diag", diag=r) for r in rows_fn(n)]
    omegas = [np.pi] * len(structure)
    for q in range(n):
        structure.append(TermStructure(kind="1q", qubit=q, local=linalg.X))
        omegas.append(np.pi)
    ham = ControlledHamiltonian.create_structured(
        d, tuple(structure),
        h0_structure=TermStructure(kind="diag",
                                   diag=np.linspace(-1, 1, d)),
        dtype=jnp.float32)
    env = SimpleEnvelope(basis="bspline", n_basis=4, omegas=tuple(omegas))
    rng = np.random.default_rng(5)
    coeff = jnp.asarray(rng.standard_normal(env.coeff_shape)
                        .astype(np.float32) * 0.3)
    psi0 = cpx.from_complex(linalg.uniform_superposition(n), jnp.float32)
    meas_diag = jnp.asarray(np.linspace(0, 1, d), jnp.float32)
    return ham, env, coeff, psi0, meas_diag


def _force_packed(monkeypatch):
    import diffquantum_tpu.dynamics.product as dp
    monkeypatch.setattr(dp, "_PACKED_MIN_QUBITS", 0)


def _parity(ham, env, coeff, psi0, meas_diag, T=2.0, n_steps=6):
    def f(evolver):
        def loss(c):
            psi = evolver(ham, env, c, psi0, 0.0, T, horizon=T,
                          n_steps=n_steps)
            return jnp.sum(cpx.abs2(psi) * meas_diag, axis=-1)
        return loss
    v_f, g_f = jax.value_and_grad(f(evolve_product_fused))(coeff)
    v_x, g_x = jax.value_and_grad(f(evolve_product))(coeff)
    assert abs(float(v_f) - float(v_x)) < 1e-5
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x),
                               rtol=2e-3, atol=2e-5)


@pytest.mark.slow
def test_packed_two_valued_rows(monkeypatch):
    """{0,1} projector-style diagonals (c=w=0.5) and a nonzero drift
    diagonal pack correctly — values and gradients match XLA."""
    _force_packed(monkeypatch)
    def rows(n):
        d = 2**n
        num0 = np.kron([1.0, 0.0], np.ones(d // 2))     # |0><0| on qubit 0
        zz = linalg.zz_diagonal(n, 0, 1)
        return [num0, zz]

    args = _custom_problem(rows)
    assert pack_diag_signs([np.asarray(st.diag) for st in args[0].structure
                            if st.kind == "diag"]) is not None
    _parity(*args)


@pytest.mark.slow
def test_streamed_fallback_three_valued_rows():
    """A 3-valued diagonal row cannot pack — the wrapper must fall back to
    the streamed-table kernels and still match XLA."""
    def rows(n):
        d = 2**n
        r = np.zeros(d)
        r[: d // 4] = 2.0
        r[d // 4: d // 2] = 1.0
        return [r, linalg.zz_diagonal(n, 2, 3)]

    args = _custom_problem(rows)
    assert pack_diag_signs([np.asarray(st.diag) for st in args[0].structure
                            if st.kind == "diag"]) is None
    _parity(*args)


@pytest.mark.slow
def test_packed_batched_per_seed(monkeypatch):
    """Batched packed kernel: per-seed coefficients, values + summed-energy
    gradients vs vmapped XLA product (router forced — production routes
    streamed kernels below 18 qubits)."""
    _force_packed(monkeypatch)
    prob = maxcut.build_maxcut(10, maxcut.ring_graph(10), n_basis=4,
                               dense=False)
    rng = np.random.default_rng(7)
    b, n_steps = 3, 6
    coeffs = jnp.asarray(rng.standard_normal(
        (b,) + prob.envelope.coeff_shape).astype(np.float32) * 0.3)
    batch = jax.tree_util.tree_map(lambda x: jnp.stack([x] * b), prob.psi0)

    def loss_f(cs):
        psi = evolve_product_fused(prob.ham, prob.envelope, cs, batch, 0.0,
                                   prob.T, horizon=prob.T, n_steps=n_steps)
        return jnp.sum(cpx.abs2(psi) * prob.measurement.diag)

    def loss_x(cs):
        psi = jax.vmap(lambda c, p: evolve_product(
            prob.ham, prob.envelope, c, p, 0.0, prob.T, horizon=prob.T,
            n_steps=n_steps))(cs, batch)
        return jnp.sum(cpx.abs2(psi) * prob.measurement.diag)

    v_f, g_f = jax.value_and_grad(loss_f)(coeffs)
    v_x, g_x = jax.value_and_grad(loss_x)(coeffs)
    assert abs(float(v_f) - float(v_x)) < 1e-5
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x),
                               rtol=2e-3, atol=2e-5)


def test_fused_eligible_18q_requires_packable():
    """18-19q eligibility is conditional on the packed-phase form."""
    prob = maxcut.build_maxcut(18, maxcut.ring_graph(18), n_basis=4,
                               dense=False)
    assert fused_eligible(prob.ham)

    n, d = 18, 2**18
    r = np.zeros(d)
    r[: d // 4] = 2.0
    r[d // 4: d // 2] = 1.0
    structure = (TermStructure(kind="diag", diag=r),
                 TermStructure(kind="1q", qubit=0, local=linalg.X))
    ham = ControlledHamiltonian.create_structured(
        d, structure, h0_structure=TermStructure(kind="diag",
                                                 diag=np.zeros(d)),
        dtype=jnp.float32)
    assert not fused_eligible(ham)


def test_parity_sign_masks_match_dense_planes():
    """parity_sign_masks + signs_planes_device must reproduce
    pack_diag_signs' planes BIT FOR BIT (and the c/w decomposition up to
    the absorbed global flip) for every Pauli-Z-string-shaped row — the
    constant-free path that keeps [P, 2^n] int32 sign planes out of the
    serialized 18-24q programs (round-4 compile-helper OOM fix)."""
    from diffquantum_tpu.ops.fused_product import (parity_sign_masks,
                                                   signs_planes_device)

    n = 12
    d = 2**n
    rng = np.random.default_rng(7)
    rows = [linalg.zz_diagonal(n, i, (i + 1) % n) for i in range(n)]
    rows += [3.5 * linalg.zz_diagonal(n, 2, 9) - 1.25,  # scaled + offset
             np.full(d, 0.75),                          # constant row
             -2.0 * linalg.z_diagonal(n, 5)]            # single-Z field
    # a 4-qubit parity string (Z x Z x Z x Z on random qubits)
    zzzz = (linalg.z_diagonal(n, 1) * linalg.z_diagonal(n, 4)
            * linalg.z_diagonal(n, 7) * linalg.z_diagonal(n, 10))
    rows.append(zzzz)

    par = parity_sign_masks(rows)
    assert par is not None
    masks, consts, scales = par
    dense = pack_diag_signs(rows)
    assert dense is not None
    planes = np.asarray(signs_planes_device(masks, d))

    # identical decomposition row by row (reconstruct and compare)
    j = np.arange(d)
    for k, row in enumerate(rows):
        bit = (planes[k // 30] >> (k % 30)) & 1
        rec = consts[k] + scales[k] * (1.0 - 2.0 * bit)
        np.testing.assert_allclose(rec, np.asarray(row), atol=1e-12)

    # and bit-identical planes when the sign conventions line up
    _, dconsts, dscales = dense
    same = np.asarray(dscales) * np.asarray(scales) >= 0
    dplanes = np.asarray(dense[0])
    for k in range(len(rows)):
        dbit = (dplanes[k // 30] >> (k % 30)) & 1
        bit = (planes[k // 30] >> (k % 30)) & 1
        if same[k] or dscales[k] == 0 or scales[k] == 0:
            np.testing.assert_array_equal(bit, dbit)
        else:
            np.testing.assert_array_equal(bit, 1 - dbit)

    # a two-valued but NON-parity row must fall back (return None)
    bad = np.ones(d)
    bad[:3] = -1.0  # {j<3} is not a parity set
    assert parity_sign_masks([bad]) is None
    # ...while pack_diag_signs still accepts it (dense fallback exists)
    assert pack_diag_signs([bad]) is not None
