"""On-chip A/B: molecule drive set {X, Y, hop, ZZ} — fused (hop op plan)
vs the XLA product backend, amortized value+grad step latency.

The H6-chain (12q) and H8-chain (16q) drive shapes from
models/molecule.py::build_molecule_chain (big path): X/Y per qubit +
hop/(ZZ) on nearest and next-nearest pairs. Run detached:
    nohup python scripts/bench_hop_ab.py > /tmp/hop_ab.log 2>&1 &
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tests.test_fused_hop import make_hop_problem  # noqa: E402
from diffquantum_tpu.dynamics.product import (  # noqa: E402
    evolve_product, evolve_product_fused, fused_eligible)
from diffquantum_tpu.ops import cpx  # noqa: E402


def bench(n, n_steps=30, chain=20):
    pairs = [(i, i + 1) for i in range(n - 1)] + \
            [(i, i + 2) for i in range(n - 2)]
    ham, env, coeff, psi0, w = make_hop_problem(n, pairs, with_xy=True,
                                                seed=n)
    assert fused_eligible(ham)
    T = 2.0
    print(f"=== {n}q molecule drive set: {ham.n_controls} controls "
          f"({len(pairs)} hops), {n_steps} steps ===", flush=True)

    def make(evolver):
        def loss(c):
            psi = evolver(ham, env, c, psi0, 0.0, T, horizon=T,
                          n_steps=n_steps)
            return jnp.sum(cpx.abs2(psi) * w, axis=-1)

        # amortize remote dispatch: chain value+grad steps in one program
        def chained(c):
            def body(c, _):
                v, g = jax.value_and_grad(loss)(c)
                return c - 1e-6 * g, v
            c, vs = jax.lax.scan(body, c, None, length=chain)
            return c, vs
        return jax.jit(chained)

    res = {}
    for name, evolver in (("fused", evolve_product_fused),
                          ("product", evolve_product)):
        fn = make(evolver)
        t0 = time.perf_counter()
        out = fn(coeff)
        jax.block_until_ready(out)
        print(f"  {name} compile+run: {time.perf_counter()-t0:.1f}s "
              f"v0={float(out[1][0]):.6f}", flush=True)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(coeff))
            ts.append(time.perf_counter() - t0)
        ms = 1e3 * float(np.median(ts)) / chain
        print(f"  {name}: {ms:.3f} ms per value+grad step", flush=True)
        res[name] = (ms, float(out[1][0]))
    assert abs(res["fused"][1] - res["product"][1]) < 1e-4, res
    print(f"  SPEEDUP {res['product'][0]/res['fused'][0]:.2f}x", flush=True)


if __name__ == "__main__":
    sizes = [int(s) for s in sys.argv[1].split(",")] if len(sys.argv) > 1 \
        else [12, 16]
    for n in sizes:
        bench(n)
