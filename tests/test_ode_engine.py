"""The selectable adaptive-ODE engine (dynamics/ode.py) — the reference's
mesolve-style forward path as a production-accessible engine: cross-checks
against the trotter engines at tight tolerance and against the FD
gradients."""
import jax.numpy as jnp
import numpy as np

from diffquantum_tpu.dynamics.ode import evolve_ode, fd_energy_grad_ode
from diffquantum_tpu.dynamics.propagator import evolve
from diffquantum_tpu.models import maxcut
from diffquantum_tpu.ops import cpx
import pytest

F64 = jnp.float64


def _prob():
    prob = maxcut.build_maxcut(4, maxcut.ring_graph(4), n_basis=4,
                               dense=True, dtype=F64)
    rng = np.random.default_rng(3)
    coeff = jnp.asarray(rng.standard_normal(prob.envelope.coeff_shape),
                        F64) * 0.5
    return prob, coeff


def test_ode_engine_matches_fine_trotter():
    """The trotter chain converges to the ODE engine as dt -> 0 (midpoint
    sampling: second order), reaching ~1e-7 state error at 4000 steps."""
    prob, coeff = _prob()
    want = evolve_ode(prob.ham, prob.envelope, coeff, prob.psi0, 0.0,
                      prob.T, horizon=prob.T)
    got = evolve(prob.ham, prob.envelope, coeff, prob.psi0, 0.0, prob.T,
                 horizon=prob.T, n_steps=4000, t_sample="mid")
    err = np.abs(cpx.to_complex(got) - cpx.to_complex(want)).max()
    assert err < 1e-6, err
    # norm preserved by the adaptive integration
    np.testing.assert_allclose(float(cpx.norm2(want)), 1.0, atol=1e-9)


def test_ode_engine_batched_states():
    prob, coeff = _prob()
    batch = cpx.CP(jnp.stack([prob.psi0.re, prob.psi0.im]),
                   jnp.stack([prob.psi0.im, prob.psi0.re]))
    # two (non-normalized is fine) states integrated jointly == separately
    joint = evolve_ode(prob.ham, prob.envelope, coeff, batch, 0.0, prob.T,
                       horizon=prob.T)
    for i in range(2):
        one = evolve_ode(prob.ham, prob.envelope, coeff,
                         cpx.CP(batch.re[i], batch.im[i]), 0.0, prob.T,
                         horizon=prob.T)
        np.testing.assert_allclose(np.asarray(joint.re[i]),
                                   np.asarray(one.re), atol=1e-9)


@pytest.mark.slow
def test_ode_fd_gradient_matches_trotter_fd():
    """The mesolve-semantics FD gradient (adaptive forward sims, the
    reference's `sim_plain.py:308-353` recipe) agrees with the vmapped
    trotter FD at fine resolution."""
    import jax

    from diffquantum_tpu.gradients.fd import fd_energy_grad

    prob, coeff = _prob()
    g_ode = fd_energy_grad_ode(prob.ham, prob.envelope, prob.measurement,
                               coeff, prob.psi0, prob.T, delta=1e-4)
    g_tr = fd_energy_grad(prob.ham, prob.envelope, prob.measurement,
                          coeff, prob.psi0, float(prob.T),
                          jax.random.PRNGKey(0), n_steps=2000, delta=1e-4,
                          t_sample="mid")
    np.testing.assert_allclose(g_ode, np.asarray(g_tr), rtol=5e-4,
                               atol=1e-6)
