"""On-chip A/B: per-call chunked engine vs the single-call mega engine.

Measures forward-only and value+grad step latency at 20q and 22q
(the chunked engine's production sizes). Run detached:
    nohup python scripts/bench_mega_ab.py > /tmp/mega_ab.log 2>&1 &
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from diffquantum_tpu.models import maxcut
from diffquantum_tpu.ops import cpx
from diffquantum_tpu.ops.fused_chunked import (chunked_evolve,
                                               chunked_evolve_mega)


from tests.test_fused_chunked import _packed_args as packed_args  # noqa: E402


def bench(n, n_steps, fast=False, engines=("percall", "mega")):
    print(f"=== {n}q, {n_steps} steps, fast={fast} ===", flush=True)
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4,
                               dense=False)
    rng = np.random.default_rng(0)
    coeff = jnp.asarray(
        rng.standard_normal(prob.envelope.coeff_shape).astype(np.float32)
        * 0.3)
    (ud_full, theta_x, h0th, signs, qubits, nq,
     kinds) = packed_args(prob, coeff, n_steps)

    diag = prob.measurement.diag

    def make(evolver):
        def loss(ud, tx):
            psi = evolver(prob.psi0, ud, tx, h0th, signs, qubits, nq,
                          kinds, fast)
            return jnp.sum(cpx.abs2(psi) * diag, axis=-1)
        fwd = jax.jit(loss)
        vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
        return fwd, vg

    results = {}
    for name, evolver in (("percall", chunked_evolve),
                          ("mega", chunked_evolve_mega)):
        if name not in engines:
            continue
        fwd, vg = make(evolver)
        t0 = time.perf_counter()
        v = fwd(ud_full, theta_x)
        v.block_until_ready()
        print(f"  {name} fwd compile+run: {time.perf_counter()-t0:.1f}s "
              f"v={float(v):.6f}", flush=True)
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            fwd(ud_full, theta_x).block_until_ready()
            ts.append(time.perf_counter() - t0)
        fwd_ms = 1e3 * float(np.median(ts))
        t0 = time.perf_counter()
        v, (gu, gt) = vg(ud_full, theta_x)
        jax.block_until_ready((v, gu, gt))
        print(f"  {name} grad compile+run: {time.perf_counter()-t0:.1f}s "
              f"v={float(v):.6f} |gu|={float(jnp.linalg.norm(gu)):.4f}",
              flush=True)
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            jax.block_until_ready(vg(ud_full, theta_x))
            ts.append(time.perf_counter() - t0)
        grad_ms = 1e3 * float(np.median(ts))
        print(f"  {name}: fwd {fwd_ms:.2f} ms, value+grad {grad_ms:.2f} ms",
              flush=True)
        results[name] = (fwd_ms, grad_ms, float(v))
    if "percall" in engines and "mega" in engines:
        pc, mg = results["percall"], results["mega"]
        assert abs(pc[2] - mg[2]) < 1e-5, (pc[2], mg[2])
        print(f"  SPEEDUP fwd {pc[0]/mg[0]:.2f}x, grad {pc[1]/mg[1]:.2f}x",
              flush=True)


if __name__ == "__main__":
    engines = tuple(sys.argv[1].split(",")) if len(sys.argv) > 1 \
        else ("percall", "mega")
    sizes = [int(s) for s in sys.argv[2].split(",")] if len(sys.argv) > 2 \
        else [20, 22]
    for n in sizes:
        bench(n, n_steps=30, engines=engines)
