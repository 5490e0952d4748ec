"""High-order ODE oracle: bound the trotter error against the TRUE
time-ordered dynamics.

The reference forward-integrates its FD and fidelity paths with an adaptive
ODE solver (`/root/reference/sim_plain.py:330,386,448` — qutip ``mesolve``);
the rebuild approximates every path on a trotter grid. These tests integrate
the exact Schrodinger equation i d|psi>/dt = H(t)|psi> with scipy
``solve_ivp`` (rtol/atol 1e-11, complex128, the continuous envelope u(t)
evaluated pointwise) on the actual demo workload, and verify that

- the dense per-step-expm backend converges to the oracle at the expected
  first order in dt (left-endpoint piecewise-constant envelope sampling —
  reference semantics, `sim_plain.py:134-150`);
- the product (Strang) and fused backends add no more than the dense
  backend's discretization error at demo resolution (their splitting error
  is higher order than the shared envelope-sampling error).
"""
import jax
import jax.numpy as jnp
import numpy as np
from scipy.integrate import solve_ivp

from diffquantum_tpu.dynamics.product import (evolve_product,
                                              evolve_product_fused)
from diffquantum_tpu.dynamics.propagator import evolve
from diffquantum_tpu.models import maxcut
from diffquantum_tpu.ops import cpx
import pytest


def _demo_problem(dtype=jnp.float64):
    prob = maxcut.build_maxcut(4, maxcut.ring_graph(4), n_basis=6,
                               dense=True, dtype=dtype)
    rng = np.random.default_rng(42)
    coeff = jnp.asarray(
        rng.standard_normal(prob.envelope.coeff_shape), dtype=dtype) * 0.5
    return prob, coeff


def _ode_oracle(prob, coeff, T):
    """solve_ivp ground truth for psi(T) under the CONTINUOUS envelope."""
    H0 = cpx.to_complex(prob.ham.H0)
    Hs = cpx.to_complex(prob.ham.Hs)  # [n_controls, d, d]
    env, c64 = prob.envelope, jnp.asarray(coeff, jnp.float64)

    amp = jax.jit(lambda t: env.amplitudes(c64, t.reshape(1), T)[:, 0])

    def rhs(t, y):
        u = np.asarray(amp(jnp.asarray(t)))
        H = H0 + np.tensordot(u, Hs, axes=1)
        return -1j * (H @ y)

    psi0 = cpx.to_complex(prob.psi0)
    sol = solve_ivp(rhs, (0.0, T), psi0, rtol=1e-11, atol=1e-11,
                    method="DOP853")
    assert sol.success
    return sol.y[:, -1]


def _err(psi_cp, psi_ref):
    got = np.asarray(psi_cp.re) + 1j * np.asarray(psi_cp.im)
    return float(np.linalg.norm(got - psi_ref))


def test_dense_trotter_converges_to_ode_oracle():
    prob, coeff = _demo_problem()
    T = float(prob.T)
    ref = _ode_oracle(prob, coeff, T)
    errs = []
    for n_steps in (30, 60, 120):
        psi = evolve(prob.ham, prob.envelope, coeff, prob.psi0, 0.0, T,
                     horizon=T, n_steps=n_steps, backend="expm")
        errs.append(_err(psi, ref))
    # left-endpoint piecewise-constant sampling → first-order global error
    assert 1.6 < errs[0] / errs[1] < 2.6, errs
    assert 1.6 < errs[1] / errs[2] < 2.6, errs
    assert errs[2] < 0.03, errs  # measured 0.0234 at 120 steps


def test_product_and_fused_error_dominated_by_sampling():
    """At the demo resolution (per_step=10 → 30 steps) the product/fused
    backends must sit within a small factor of the dense backend's distance
    to the true dynamics — i.e. Strang splitting adds no leading-order
    error."""
    prob, coeff = _demo_problem()
    T = float(prob.T)
    ref = _ode_oracle(prob, coeff, T)
    n_steps = 30
    e_dense = _err(evolve(prob.ham, prob.envelope, coeff, prob.psi0, 0.0, T,
                          horizon=T, n_steps=n_steps, backend="expm"), ref)
    e_prod = _err(evolve_product(prob.ham, prob.envelope, coeff, prob.psi0,
                                 0.0, T, horizon=T, n_steps=n_steps), ref)
    assert e_prod < 1.5 * e_dense + 1e-6, (e_prod, e_dense)


def test_fused_10q_within_sampling_error_of_ode():
    """The fused Pallas kernel (f32, 10 qubits) on a demo-family workload
    stays within a small factor of the XLA product backend's true-dynamics
    error (its extra f32 round-off is orders below the dt error)."""
    prob, coeff = _demo_problem()
    # a 10-qubit structured sibling of the demo for the fused path, with a
    # dense twin for the oracle
    prob10 = maxcut.build_maxcut(10, maxcut.ring_graph(10), n_basis=6,
                                 dense=False, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    c10 = jnp.asarray(rng.standard_normal(prob10.envelope.coeff_shape),
                      dtype=jnp.float32) * 0.5
    T = float(prob10.T)
    n_steps = 30
    pf = evolve_product_fused(prob10.ham, prob10.envelope, c10, prob10.psi0,
                              0.0, T, horizon=T, n_steps=n_steps)
    # oracle via the f64 XLA product at 16x resolution (converged reference:
    # dense 1024x1024 expm is avoidable — product at fine dt has error
    # O(dt_fine) << O(dt))
    prob10_64 = maxcut.build_maxcut(10, maxcut.ring_graph(10), n_basis=6,
                                    dense=False, dtype=jnp.float64)
    fine = evolve_product(prob10_64.ham, prob10_64.envelope,
                          c10.astype(jnp.float64), prob10_64.psi0, 0.0, T,
                          horizon=T, n_steps=16 * n_steps)
    coarse = evolve_product(prob10_64.ham, prob10_64.envelope,
                            c10.astype(jnp.float64), prob10_64.psi0, 0.0, T,
                            horizon=T, n_steps=n_steps)
    ref = np.asarray(fine.re) + 1j * np.asarray(fine.im)
    e_fused = _err(pf, ref)
    e_coarse = _err(coarse, ref)
    assert e_fused < e_coarse * 1.05 + 1e-4, (e_fused, e_coarse)


@pytest.mark.slow
def test_midpoint_sampling_is_second_order():
    """t_sample='mid' upgrades the piecewise-constant envelope error from
    O(dt) to O(dt^2) vs the TRUE dynamics — both for the dense expm chain
    and the Strang product backend — at identical cost per step."""
    prob, coeff = _demo_problem()
    T = prob.T
    ref = _ode_oracle(prob, coeff, T)

    for backend in ("expm", "product"):
        errs = {}
        for t_sample in ("left", "mid"):
            es = []
            for n_steps in (100, 200, 400):
                psi = evolve(prob.ham, prob.envelope, coeff, prob.psi0,
                             0.0, T, horizon=T, n_steps=n_steps,
                             backend=backend, t_sample=t_sample)
                es.append(_err(psi, ref))
            errs[t_sample] = es
        # left: ~first order (ratio ~2); mid: ~second order (ratio ~4)
        for a, b in zip(errs["left"], errs["left"][1:]):
            assert 1.6 < a / b < 2.6, (backend, errs["left"])
        for a, b in zip(errs["mid"], errs["mid"][1:]):
            assert 3.2 < a / b < 4.8, (backend, errs["mid"])
        # and mid is strictly (much) more accurate at equal n_steps
        assert errs["mid"][-1] < errs["left"][-1] / 10, (backend, errs)


@pytest.mark.slow
def test_step_doubling_error_tracks_true_error():
    """The oracle-free step-doubling estimate must sit within ~2x of the
    true (adaptive-ODE) error, for both grid orders; calibrate_n_steps
    returns a grid that actually meets the tolerance."""
    from diffquantum_tpu.dynamics.propagator import (calibrate_n_steps,
                                                     step_doubling_error)
    prob, coeff = _demo_problem()
    T = prob.T
    ref = _ode_oracle(prob, coeff, T)

    for t_sample, p in (("left", 1), ("mid", 2)):
        for n_steps in (100, 200):
            est = step_doubling_error(prob.ham, prob.envelope, coeff,
                                      prob.psi0, T, n_steps,
                                      backend="expm", t_sample=t_sample)
            psi = evolve(prob.ham, prob.envelope, coeff, prob.psi0, 0.0, T,
                         horizon=T, n_steps=n_steps, backend="expm",
                         t_sample=t_sample)
            true = _err(psi, ref)
            # est ~ (1 - 2^-p) * true, modulo the next-order tail
            assert 0.25 * true < est < 1.5 * true, (t_sample, n_steps,
                                                    est, true)

    n = calibrate_n_steps(prob.ham, prob.envelope, coeff, prob.psi0, T,
                          tol=1e-4, n_start=25, backend="expm",
                          t_sample="mid")
    psi = evolve(prob.ham, prob.envelope, coeff, prob.psi0, 0.0, T,
                 horizon=T, n_steps=n, backend="expm", t_sample="mid")
    assert _err(psi, ref) < 2.5e-4, (n, _err(psi, ref))
