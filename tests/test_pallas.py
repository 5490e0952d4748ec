"""Fused Pallas Taylor-apply kernel vs the plain CP implementation
(interpret mode on CPU; the real-TPU path is exercised by bench.py)."""
import numpy as np
import scipy.linalg

from diffquantum_tpu.ops import cpx
from diffquantum_tpu.ops.expm import taylor_params
from diffquantum_tpu.ops.pallas_kernels import taylor_apply_fused


def test_fused_taylor_apply_matches_scipy():
    rng = np.random.default_rng(0)
    d, b = 48, 5  # unaligned on purpose: exercises padding
    a = rng.standard_normal((d, d)) + 1j * rng.standard_normal((d, d))
    h = (a + a.conj().T) / 2
    psi = rng.standard_normal((b, d)) + 1j * rng.standard_normal((b, d))
    z = -0.31j
    bound = 0.31 * np.linalg.norm(h, 2)
    order, s = taylor_params(bound, 1e-6)

    got = cpx.to_complex(taylor_apply_fused(
        cpx.from_complex(h), cpx.from_complex(psi), 0.0, -0.31,
        order=order, substeps=2**s, interpret=True))
    want = (scipy.linalg.expm(z * h) @ psi.T).T
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_fused_taylor_zero_z_is_identity():
    rng = np.random.default_rng(1)
    d, b = 16, 3
    h = cpx.from_complex(np.eye(d))
    psi_np = rng.standard_normal((b, d)) + 1j * rng.standard_normal((b, d))
    got = cpx.to_complex(taylor_apply_fused(
        h, cpx.from_complex(psi_np), 0.0, 0.0, order=6, substeps=1,
        interpret=True))
    np.testing.assert_allclose(got, psi_np, atol=1e-6)
