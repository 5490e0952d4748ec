"""Chunked HBM-state fused engine (ops/fused_chunked.py): 20+ qubit
evolution as two Pallas passes per Strang step with the state streamed
through VMEM slabs — values and adjoint gradients vs the XLA product
backend (interpret mode on CPU; real-chip coverage in tpu_tests)."""
import jax
import jax.numpy as jnp
import numpy as np

from diffquantum_tpu.dynamics.product import (evolve_product,
                                              evolve_product_fused,
                                              fused_eligible,
                                              split_structure)
from diffquantum_tpu.models import maxcut
from diffquantum_tpu.ops import cpx
from diffquantum_tpu.ops.fused_chunked import chunked_evolve, _plan
from diffquantum_tpu.ops.fused_product import pack_diag_signs
import pytest


def _packed_args(prob, coeff, n_steps):
    """Build the chunked_evolve inputs by hand (mirrors the
    evolve_product_fused packed_tables path)."""
    from diffquantum_tpu.dynamics.product import (_pauli_kind,
                                                  _symmetrize_rots)
    ham, env = prob.ham, prob.envelope
    (diag_idx, diag_rows, h0_diag, oneq_idx, oneq_qubits,
     oneq_locals) = split_structure(ham)
    dt = prob.T / n_steps
    ts = dt * jnp.arange(n_steps, dtype=jnp.float64)
    u = env.amplitudes(coeff, ts, prob.T)
    u_diag = u[jnp.asarray(diag_idx, jnp.int32)].astype(jnp.float32)
    u_oneq = u[jnp.asarray(oneq_idx, jnp.int32)].astype(jnp.float32)
    signs_np, consts, scales = pack_diag_signs(diag_rows)
    half = jnp.float32(0.5 * dt)
    ud_core = half * u_diag.T * jnp.asarray(scales, jnp.float32)
    off = half * (u_diag.T @ jnp.asarray(consts, jnp.float32))
    ud_full = jnp.concatenate([ud_core, off[:, None]], axis=1)
    theta_x = jnp.float32(dt) * u_oneq.T
    kinds = tuple(_pauli_kind(g) for g in oneq_locals)
    oneq_qubits, kinds, theta_x = _symmetrize_rots(
        oneq_qubits, kinds, theta_x, axis=1)
    h0th = half * jnp.asarray(h0_diag, jnp.float32)
    return (ud_full, theta_x, h0th, jnp.asarray(signs_np),
            tuple(oneq_qubits), ham.n_qubits, kinds)


def _compare(n, n_steps=4, seed=0):
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4,
                               dense=False)
    rng = np.random.default_rng(seed)
    coeff = jnp.asarray(
        rng.standard_normal(prob.envelope.coeff_shape).astype(np.float32)
        * 0.3)
    (ud_full, theta_x, h0th, signs, qubits, nq,
     kinds) = _packed_args(prob, coeff, n_steps)

    def loss_ck(ud, tx):
        psi = chunked_evolve(prob.psi0, ud, tx, h0th, signs, qubits, nq,
                             kinds, False)
        return jnp.sum(cpx.abs2(psi) * prob.measurement.diag, axis=-1)

    def loss_x(c):
        psi = evolve_product(prob.ham, prob.envelope, c, prob.psi0, 0.0,
                             prob.T, horizon=prob.T, n_steps=n_steps)
        return jnp.sum(cpx.abs2(psi) * prob.measurement.diag, axis=-1)

    (v_c, (g_ud, g_tx)) = jax.value_and_grad(loss_ck, argnums=(0, 1))(
        ud_full, theta_x)
    v_x = loss_x(coeff)
    assert abs(float(v_c) - float(v_x)) < 1e-5, (float(v_c), float(v_x))

    # gradient check: finite differences directly on the kernel inputs
    rng2 = np.random.default_rng(seed + 1)
    for arr, g in ((ud_full, g_ud), (theta_x, g_tx)):
        direction = jnp.asarray(
            rng2.standard_normal(arr.shape).astype(np.float32))
        eps = 1e-3
        vp = loss_ck(*((arr + eps * direction, theta_x)
                       if arr is ud_full else
                       (ud_full, arr + eps * direction)))
        vm = loss_ck(*((arr - eps * direction, theta_x)
                       if arr is ud_full else
                       (ud_full, arr - eps * direction)))
        fd = (float(vp) - float(vm)) / (2 * eps)
        an = float(jnp.sum(g * direction))
        assert abs(fd - an) < 5e-3 * max(1.0, abs(fd)), (fd, an)


@pytest.mark.slow
def test_chunked_no_chunk_bits_12q():
    """c = 0 (state fits one slab column): pure pass-A path."""
    assert _plan(12) == (0, 5)
    _compare(12, n_steps=5, seed=1)


@pytest.mark.slow
def test_chunked_with_chunk_bits_18q():
    """c = 1: pass B chunk-bit rotations exercised."""
    assert _plan(18) == (1, 10)
    _compare(18, n_steps=3, seed=2)


@pytest.mark.slow
def test_chunked_direct_20q():
    """Direct chunked engine at 20 qubits (multi-chunk pass B)."""
    assert _plan(20) == (3, 10)
    _compare(20, n_steps=2, seed=6)


@pytest.mark.slow
def test_20q_routing_and_parity():
    """20 qubits through the public evolve_product_fused API (routes to
    the chunked HBM-state engine — the VMEM kernel caps at 18q) and
    matches the XLA product backend, values and coefficient gradients."""
    n, n_steps = 20, 3
    assert _plan(n) == (3, 10)
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4,
                               dense=False)
    assert fused_eligible(prob.ham)
    rng = np.random.default_rng(3)
    coeff = jnp.asarray(
        rng.standard_normal(prob.envelope.coeff_shape).astype(np.float32)
        * 0.3)

    def f(evolver):
        def loss(c):
            psi = evolver(prob.ham, prob.envelope, c, prob.psi0, 0.0,
                          prob.T, horizon=prob.T, n_steps=n_steps)
            return jnp.sum(cpx.abs2(psi) * prob.measurement.diag, axis=-1)
        return loss

    v_f, g_f = jax.value_and_grad(f(evolve_product_fused))(coeff)
    v_x, g_x = jax.value_and_grad(f(evolve_product))(coeff)
    assert abs(float(v_f) - float(v_x)) < 1e-5
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x),
                               rtol=2e-3, atol=2e-5)


@pytest.mark.slow
def test_chunked_single_step():
    """n_steps=1 boundary handling (no merged interior phases)."""
    _compare(12, n_steps=1, seed=4)


def _compare_mega(n, n_steps=3, seed=0):
    """chunked_evolve_mega vs chunked_evolve: same inputs, values and
    gradients must agree to fp tolerance (same cores, same op order)."""
    from diffquantum_tpu.ops.fused_chunked import chunked_evolve_mega
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4,
                               dense=False)
    rng = np.random.default_rng(seed)
    coeff = jnp.asarray(
        rng.standard_normal(prob.envelope.coeff_shape).astype(np.float32)
        * 0.3)
    (ud_full, theta_x, h0th, signs, qubits, nq,
     kinds) = _packed_args(prob, coeff, n_steps)

    def loss(evolver):
        def f(ud, tx):
            psi = evolver(prob.psi0, ud, tx, h0th, signs, qubits, nq,
                          kinds, False)
            return jnp.sum(cpx.abs2(psi) * prob.measurement.diag, axis=-1)
        return f

    v_m, (gud_m, gtx_m) = jax.value_and_grad(
        loss(chunked_evolve_mega), argnums=(0, 1))(ud_full, theta_x)
    v_c, (gud_c, gtx_c) = jax.value_and_grad(
        loss(chunked_evolve), argnums=(0, 1))(ud_full, theta_x)
    assert abs(float(v_m) - float(v_c)) < 1e-6, (float(v_m), float(v_c))
    np.testing.assert_allclose(np.asarray(gud_m), np.asarray(gud_c),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gtx_m), np.asarray(gtx_c),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_mega_no_chunk_bits_12q():
    _compare_mega(12, n_steps=4, seed=7)


@pytest.mark.slow
def test_mega_with_chunk_bits_18q():
    _compare_mega(18, n_steps=3, seed=8)


@pytest.mark.slow
def test_mega_multi_chunk_20q():
    _compare_mega(20, n_steps=2, seed=9)


@pytest.mark.slow
def test_mega_single_step():
    _compare_mega(12, n_steps=1, seed=10)


@pytest.mark.slow
def test_mega_batched_matches_per_seed():
    """chunked_evolve_mega_batched (ONE kernel, grid (B, T+1)) vs the
    per-seed mega: values and summed-loss gradients must agree to fp
    tolerance (same cores, per-seed DMA windows)."""
    from diffquantum_tpu.ops.fused_chunked import (chunked_evolve_mega,
                                                   chunked_evolve_mega_batched)
    n, n_steps, bsz = 18, 3, 2
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4,
                               dense=False)
    rng = np.random.default_rng(11)
    outs = []
    for s in range(bsz):
        coeff = jnp.asarray(rng.standard_normal(
            prob.envelope.coeff_shape).astype(np.float32) * 0.3)
        outs.append(_packed_args(prob, coeff, n_steps))
    ud_b = jnp.stack([o[0] for o in outs], axis=1)     # [T, B, nd+1]
    tx_b = jnp.stack([o[1] for o in outs], axis=1)     # [T, B, n_x]
    h0th, signs, qubits, nq, kinds = outs[0][2:]
    psi_b = jax.tree_util.tree_map(lambda x: jnp.stack([x] * bsz),
                                   prob.psi0)
    w = prob.measurement.diag

    def loss_b(ud, tx):
        psi = chunked_evolve_mega_batched(psi_b, ud, tx, h0th, signs,
                                          qubits, nq, kinds, False)
        return jnp.sum(cpx.abs2(psi) * w)

    def loss_s(ud, tx):
        tot = 0.0
        for s in range(bsz):
            psi = chunked_evolve_mega(
                cpx.CP(psi_b.re[s], psi_b.im[s]), ud[:, s], tx[:, s], h0th,
                signs, qubits, nq, kinds, False)
            tot = tot + jnp.sum(cpx.abs2(psi) * w)
        return tot

    v_b, (gud_b, gtx_b) = jax.value_and_grad(loss_b, argnums=(0, 1))(
        ud_b, tx_b)
    v_s, (gud_s, gtx_s) = jax.value_and_grad(loss_s, argnums=(0, 1))(
        ud_b, tx_b)
    assert abs(float(v_b) - float(v_s)) < 1e-6, (float(v_b), float(v_s))
    np.testing.assert_allclose(np.asarray(gud_b), np.asarray(gud_s),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gtx_b), np.asarray(gtx_s),
                               rtol=1e-4, atol=1e-6)
