"""Channel (carrier/two-quadrature) pulse model on the FRONTIER engines.

VERDICT r4 #6: the channel model (`/root/reference/diffqc.cc:95-135`) was
chip-proven only at 12 qubits, where the STREAMED kernels carry it
(tests/test_channel_structured.py). Its amplitude tables are plain
``u[n_controls, n_t]`` arrays, so the packed-phase (18q) and chunked-mega
(19-24q) engines must consume them unchanged — these tests force the
router onto each frontier engine at a cheap size (interpret mode) and pin
values + adjoint gradients against the XLA product backend. The on-chip
18q number is bench.py's ``channel18q_grad_step``; the real-kernel lane
test lives in tpu_tests/test_tpu_kernels.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffquantum_tpu.dynamics.product import (evolve_product,
                                              evolve_product_fused,
                                              fused_eligible,
                                              select_engine)
from diffquantum_tpu.ops import cpx

from test_channel_structured import _ring_problem


def _channel_parity(n, n_steps=6):
    ham, env, vv, psi0, T = _ring_problem(n, jnp.float32, dense=False)
    assert fused_eligible(ham)
    w = jnp.arange(ham.dim, dtype=jnp.float32) / ham.dim

    def f(evolver):
        def loss(c):
            psi = evolver(ham, env, c, psi0, 0.0, T, horizon=T,
                          n_steps=n_steps)
            return jnp.sum(cpx.abs2(psi) * w, axis=-1)
        return loss

    v_f, g_f = jax.value_and_grad(f(evolve_product_fused))(vv)
    v_x, g_x = jax.value_and_grad(f(evolve_product))(vv)
    assert abs(float(v_f) - float(v_x)) < 2e-5, (float(v_f), float(v_x))
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x),
                               rtol=2e-3, atol=2e-5)
    return ham


@pytest.mark.slow
def test_channel_packed_parity(monkeypatch):
    """Channel angle tables through the packed-phase VMEM kernel (the 18q
    engine, forced at 10q): values + gradients match XLA product."""
    import diffquantum_tpu.dynamics.product as dp
    monkeypatch.setattr(dp, "_PACKED_MIN_QUBITS", 0)
    ham = _channel_parity(10)
    assert select_engine(ham) == "packed"


@pytest.mark.slow
def test_channel_mega_parity(monkeypatch):
    """Channel angle tables through the chunked-mega HBM-state engine (the
    19-24q engine, forced at 10q): values + gradients match XLA product."""
    import diffquantum_tpu.dynamics.product as dp
    monkeypatch.setattr(dp, "_PACKED_MIN_QUBITS", 0)
    monkeypatch.setattr(dp, "_VMEM_PACKED_MAX", 0)
    ham = _channel_parity(10)
    assert select_engine(ham) == "mega"
