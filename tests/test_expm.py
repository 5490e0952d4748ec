"""expm kernels (real-pair CP representation) vs scipy.linalg.expm oracles
and unitarity invariants."""
import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from diffquantum_tpu.ops import cpx
from diffquantum_tpu.ops.expm import (cexpm_apply_taylor, cexpm_pade13,
                                      cexpm_taylor, taylor_params)

F64 = jnp.float64


def random_hermitian(rng, d):
    a = rng.standard_normal((d, d)) + 1j * rng.standard_normal((d, d))
    return (a + a.conj().T) / 2


def test_taylor_params_reasonable():
    m, s = taylor_params(4.0, 1e-10)
    assert s >= 2 and m <= 24
    m0, s0 = taylor_params(1e-12, 1e-10)
    assert s0 == 0


def test_cpx_roundtrip_and_matmul():
    rng = np.random.default_rng(7)
    a = rng.standard_normal((5, 5)) + 1j * rng.standard_normal((5, 5))
    b = rng.standard_normal((5, 5)) + 1j * rng.standard_normal((5, 5))
    ca, cb = cpx.from_complex(a, F64), cpx.from_complex(b, F64)
    np.testing.assert_allclose(cpx.to_complex(ca), a, atol=1e-12)
    np.testing.assert_allclose(cpx.to_complex(cpx.matmul(ca, cb)), a @ b,
                               atol=1e-12)
    psi = rng.standard_normal((3, 5)) + 1j * rng.standard_normal((3, 5))
    cpsi = cpx.from_complex(psi, F64)
    np.testing.assert_allclose(cpx.to_complex(cpx.matvec(ca, cpsi)),
                               (a @ psi.T).T, atol=1e-12)
    np.testing.assert_allclose(cpx.to_complex(cpx.vdot(cpsi, cpsi)),
                               np.sum(np.abs(psi) ** 2, axis=1), atol=1e-12)


def test_cexpm_taylor_matches_scipy():
    rng = np.random.default_rng(0)
    for d in (4, 16, 48):
        h = random_hermitian(rng, d)
        a = -0.37j * h
        bound = 0.37 * np.linalg.norm(h, 2)
        got = cpx.to_complex(cexpm_taylor(cpx.from_complex(a, F64), bound,
                                          tol=1e-12))
        want = scipy.linalg.expm(a)
        np.testing.assert_allclose(got, want, atol=5e-11)


def test_cexpm_taylor_batched():
    rng = np.random.default_rng(1)
    hs = np.stack([random_hermitian(rng, 8) for _ in range(5)])
    a = -0.2j * hs
    bound = 0.2 * max(np.linalg.norm(h, 2) for h in hs)
    got = cpx.to_complex(cexpm_taylor(cpx.from_complex(a, F64), bound,
                                      tol=1e-12))
    want = np.stack([scipy.linalg.expm(m) for m in a])
    np.testing.assert_allclose(got, want, atol=5e-11)


def test_cexpm_pade13_matches_scipy():
    rng = np.random.default_rng(2)
    h = random_hermitian(rng, 12)
    a = -1.7j * h  # larger norm exercises squaring
    bound = 1.7 * np.linalg.norm(h, 2)
    got = cpx.to_complex(cexpm_pade13(cpx.from_complex(a, F64), bound))
    np.testing.assert_allclose(got, scipy.linalg.expm(a), atol=1e-10)


def test_cexpm_apply_taylor_single_and_batch():
    rng = np.random.default_rng(4)
    d = 32
    h = random_hermitian(rng, d)
    z = -0.9j
    bound = 0.9 * np.linalg.norm(h, 2)
    want_mat = scipy.linalg.expm(z * h)
    ch = cpx.from_complex(h, F64)

    psi = rng.standard_normal(d) + 1j * rng.standard_normal(d)
    got = cpx.to_complex(cexpm_apply_taylor(ch, cpx.from_complex(psi, F64),
                                            0.0, -0.9, bound, tol=1e-12))
    np.testing.assert_allclose(got, want_mat @ psi, atol=1e-9)

    batch = rng.standard_normal((7, d)) + 1j * rng.standard_normal((7, d))
    got_b = cpx.to_complex(cexpm_apply_taylor(ch, cpx.from_complex(batch, F64),
                                              0.0, -0.9, bound, tol=1e-12))
    np.testing.assert_allclose(got_b, (want_mat @ batch.T).T, atol=1e-9)


def test_cexpm_apply_preserves_norm_over_long_chain():
    # 1000 sequential applications must not drift (unitarity accumulation,
    # the BASELINE.md stretch concern).
    rng = np.random.default_rng(5)
    d = 16
    h_np = random_hermitian(rng, d)
    h = cpx.from_complex(h_np, F64)
    bound = float(np.linalg.norm(h_np, 2)) * 0.05
    psi_np = rng.standard_normal(d) + 1j * rng.standard_normal(d)
    psi_np /= np.linalg.norm(psi_np)
    psi = cpx.from_complex(psi_np, F64)

    def step(p, _):
        return cexpm_apply_taylor(h, p, 0.0, -0.05, bound, tol=1e-12), None

    out, _ = jax.lax.scan(step, psi, None, length=1000)
    norm = float(jnp.sqrt(cpx.norm2(out)))
    assert abs(norm - 1.0) < 1e-8
