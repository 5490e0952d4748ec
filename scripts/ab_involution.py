"""On-chip A/B for the backward-kernel involution optimization.

Measures the VPU-bound workloads most sensitive to the backward rotation
cost (G(x) derived from G(y) via G^2 = I / K^2 = -I — 4 generator
applications per rotation instead of 6):

- 12q headline grad step (chain=100 amortized),
- 16q x 1000-step adjoint grad (the stretch config),
- 18q packed-VMEM grad step (chain=20),
- 20q chunked grad step (chain=10),

plus an on-chip exactness check of the fused gradient vs the XLA product
path at 12q. Run detached:  nohup python scripts/ab_involution.py > /tmp/ab_inv.log 2>&1 &
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/diffquantum_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # tunnel health probe first
    t0 = time.perf_counter()
    x = jnp.ones((8, 128), jnp.float32)
    jax.block_until_ready(x @ x.T)
    print(f"probe ok ({time.perf_counter()-t0:.2f}s), backend="
          f"{jax.default_backend()}", flush=True)

    from bench import amortized_step_latency
    from diffquantum_tpu.dynamics.product import (evolve_product,
                                                  evolve_product_fused)
    from diffquantum_tpu.dynamics.propagator import reference_n_steps
    from diffquantum_tpu.models import maxcut
    from diffquantum_tpu.ops import cpx

    rng = np.random.default_rng(0)
    per_step = 10

    def make_loss(nq, n_steps=None, evolver=evolve_product_fused):
        prob = maxcut.build_maxcut(nq, maxcut.ring_graph(nq), n_basis=6,
                                   dense=False)
        ns = n_steps or reference_n_steps(per_step, 0.0, prob.T)

        def loss(c):
            psi = evolver(prob.ham, prob.envelope, c, prob.psi0, 0.0,
                          prob.T, horizon=prob.T, n_steps=ns)
            return jnp.sum(cpx.abs2(psi) * prob.measurement.diag, axis=-1)

        c0 = jnp.asarray(rng.standard_normal(
            prob.envelope.coeff_shape).astype(np.float32) * 1e-3)
        return loss, c0

    # exactness: fused vs XLA product gradient at 12q, on chip
    loss_f, c12 = make_loss(12)
    loss_x, _ = make_loss(12, evolver=evolve_product)
    vf, gf = jax.jit(jax.value_and_grad(loss_f))(c12)
    vx, gx = jax.jit(jax.value_and_grad(loss_x))(c12)
    dv = abs(float(vf) - float(vx))
    dg = float(jnp.max(jnp.abs(gf - gx)) / (jnp.max(jnp.abs(gx)) + 1e-30))
    print(json.dumps({"check": "fused12_vs_xla", "dv": dv,
                      "grad_rel": dg}), flush=True)
    assert dv < 1e-4 and dg < 1e-3, "on-chip parity FAILED"

    for nq, chain, ns in ((12, 100, None), (16, 10, 1000), (18, 20, None),
                          (20, 10, None)):
        try:
            loss_n, c_n = make_loss(nq, n_steps=ns)
            per, single = amortized_step_latency(
                jax.value_and_grad(loss_n), c_n, chain=chain, n_runs=8)
            print(json.dumps({"metric": f"grad_step_{nq}q"
                                        + (f"_{ns}steps" if ns else ""),
                              "ms": round(per * 1e3, 3),
                              "single_ms": round(single * 1e3, 2)}),
                  flush=True)
        except Exception as e:
            print(f"{nq}q failed: {e}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
