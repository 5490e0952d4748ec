"""expm kernels vs scipy.linalg.expm and unitarity invariants."""
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from diffquantum_tpu.ops.expm import (
    expm_apply_taylor, expm_hermitian, expm_pade13, expm_taylor, taylor_params)


def random_hermitian(rng, d):
    a = rng.standard_normal((d, d)) + 1j * rng.standard_normal((d, d))
    return (a + a.conj().T) / 2


def test_taylor_params_reasonable():
    m, s = taylor_params(4.0, 1e-10)
    assert s >= 2 and m <= 24
    m0, s0 = taylor_params(1e-12, 1e-10)
    assert s0 == 0


def test_expm_taylor_matches_scipy():
    rng = np.random.default_rng(0)
    for d in (4, 16, 48):
        h = random_hermitian(rng, d)
        a = -0.37j * h
        bound = 0.37 * np.linalg.norm(h, 2)
        got = np.asarray(expm_taylor(jnp.asarray(a), bound, tol=1e-12))
        want = scipy.linalg.expm(a)
        np.testing.assert_allclose(got, want, atol=5e-11)


def test_expm_taylor_batched():
    rng = np.random.default_rng(1)
    hs = np.stack([random_hermitian(rng, 8) for _ in range(5)])
    a = -0.2j * hs
    bound = 0.2 * max(np.linalg.norm(h, 2) for h in hs)
    got = np.asarray(expm_taylor(jnp.asarray(a), bound, tol=1e-12))
    want = np.stack([scipy.linalg.expm(m) for m in a])
    np.testing.assert_allclose(got, want, atol=5e-11)


def test_expm_pade13_matches_scipy():
    rng = np.random.default_rng(2)
    h = random_hermitian(rng, 12)
    a = -1.7j * h  # larger norm exercises squaring
    bound = 1.7 * np.linalg.norm(h, 2)
    got = np.asarray(expm_pade13(jnp.asarray(a), bound))
    np.testing.assert_allclose(got, scipy.linalg.expm(a), atol=1e-10)


def test_expm_hermitian_unitary():
    rng = np.random.default_rng(3)
    h = random_hermitian(rng, 10)
    u = np.asarray(expm_hermitian(jnp.asarray(h), -0.5j))
    np.testing.assert_allclose(u @ u.conj().T, np.eye(10), atol=1e-12)
    np.testing.assert_allclose(u, scipy.linalg.expm(-0.5j * h), atol=1e-10)


def test_expm_apply_taylor_single_and_batch():
    rng = np.random.default_rng(4)
    d = 32
    h = random_hermitian(rng, d)
    z = -0.9j
    bound = 0.9 * np.linalg.norm(h, 2)
    want_mat = scipy.linalg.expm(z * h)

    psi = rng.standard_normal(d) + 1j * rng.standard_normal(d)
    got = np.asarray(expm_apply_taylor(jnp.asarray(h), jnp.asarray(psi), z,
                                       bound, tol=1e-12))
    np.testing.assert_allclose(got, want_mat @ psi, atol=1e-9)

    batch = rng.standard_normal((7, d)) + 1j * rng.standard_normal((7, d))
    got_b = np.asarray(expm_apply_taylor(jnp.asarray(h), jnp.asarray(batch), z,
                                         bound, tol=1e-12))
    np.testing.assert_allclose(got_b, (want_mat @ batch.T).T, atol=1e-9)


def test_expm_apply_preserves_norm_over_long_chain():
    # 1000 sequential applications must not drift (unitarity accumulation,
    # the BASELINE.md stretch concern).
    rng = np.random.default_rng(5)
    d = 16
    h = jnp.asarray(random_hermitian(rng, d))
    bound = float(np.linalg.norm(np.asarray(h), 2)) * 0.05
    psi = jnp.asarray(rng.standard_normal(d) + 1j * rng.standard_normal(d))
    psi = psi / jnp.linalg.norm(psi)
    import jax

    def step(p, _):
        return expm_apply_taylor(h, p, -0.05j, bound, tol=1e-12), None

    out, _ = jax.lax.scan(step, psi, None, length=1000)
    assert abs(float(jnp.linalg.norm(out)) - 1.0) < 1e-8
