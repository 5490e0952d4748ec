"""A/B the round-5 cross-step phase merge on the real chip.

Measures the three workloads the merge touches (12q headline — streamed
kernels; 16q x 1000-step stretch — streamed; 18q packed grad step) with
the SAME amortized methodology as bench.py. Run once per side:

    nohup python scripts/ab_phase_merge.py > /tmp/ab_merge_B.log 2>&1 &
    # then: git stash / checkout the pre-merge ops/fused_product.py,
    # rerun into /tmp/ab_merge_A.log, restore.

(The 20q chunked / hop-mega engines already merged phases in rounds 3-4
and are untouched — they act as the control.)
"""
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def measure(step_fn, arg, extra, chain, n_runs=8):
    import jax

    def chained(c, *ex):
        def body(c, _):
            _, g = step_fn(c, *ex)
            return c - 1e-6 * g, None
        return jax.lax.scan(body, c, None, length=chain)[0]

    f = jax.jit(chained)
    t0 = time.time()
    jax.block_until_ready(f(arg, *extra))
    compile_s = time.time() - t0
    ts = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        jax.block_until_ready(f(arg, *extra))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / chain, compile_s


def main():
    import jax
    import jax.numpy as jnp

    # NO persistent cache: each side must compile its own kernels
    from diffquantum_tpu.dynamics.product import evolve_product_fused
    from diffquantum_tpu.models import maxcut
    from diffquantum_tpu.ops import cpx

    rng = np.random.default_rng(0)
    for n, n_steps, chain in ((12, 30, 100), (18, 30, 20), (16, 1000, 4)):
        prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=6,
                                   dense=False)

        def loss(c, wv, _p=prob, _ns=n_steps):
            psi = evolve_product_fused(_p.ham, _p.envelope, c, _p.psi0,
                                       0.0, _p.T, horizon=_p.T, n_steps=_ns)
            return jnp.sum(cpx.abs2(psi) * wv, axis=-1)

        c0 = jnp.asarray(rng.standard_normal(
            prob.envelope.coeff_shape).astype(np.float32) * 1e-3)
        t, comp = measure(jax.value_and_grad(loss), c0,
                          (prob.measurement.diag,), chain)
        print(json.dumps({"workload": f"{n}q x {n_steps}-step grad",
                          "per_step_ms": round(t * 1e3, 3),
                          "compile_s": round(comp, 1)}), flush=True)


if __name__ == "__main__":
    main()
