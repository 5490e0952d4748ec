"""On-chip probe for the round-5 hop-mega rework (SMEM tables,
cond-gated flips, kind-specialized op bodies — ops/fused_mega_hop.py).

Reproduces bench.py's molecule section shape (X/Y per qubit + hop chain
and next-nearest pairs + ZZ rows, bspline envelopes, T=2) and reports:
  1. cold compile + first value_and_grad wall time,
  2. a finite-difference gradient probe (adjoint exactness on chip),
  3. the amortized per-step grad latency (chain-of-steps methodology,
     identical to bench.py::amortized_step_latency).

Round-4 baseline to beat (BENCH_r04): molecule20q_hop_grad_step =
1961.5 ms/step at 114 controls — VERDICT r5 directive #3 target ≤500 ms.

Usage: python scripts/bench_hop_r5.py [nmol] [n_steps] [chain]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def molecule_grad_fn(nmol, n_steps, n_basis=4):
    import jax
    import jax.numpy as jnp
    from diffquantum_tpu.dynamics.hamiltonian import (ControlledHamiltonian,
                                                      TermStructure)
    from diffquantum_tpu.dynamics.product import (evolve_product_fused,
                                                  fused_eligible)
    from diffquantum_tpu.ops import cpx
    from diffquantum_tpu.ops import linalg as _lin
    from diffquantum_tpu.pulses.envelope import SimpleEnvelope

    rng = np.random.default_rng(0)
    dmol = 2**nmol
    pairs = [(i, i + 1) for i in range(nmol - 1)] + \
            [(i, i + 2) for i in range(nmol - 2)]
    structure, omegas = [], []
    for q in range(nmol):
        for loc in (_lin.X, _lin.Y):
            structure.append(TermStructure(kind="1q", qubit=q, local=loc))
            omegas.append(np.pi)
    for (i, j) in pairs:
        structure.append(TermStructure(kind="hop", qubit=i, qubit2=j))
        omegas.append(np.pi)
        structure.append(TermStructure(
            kind="diag", diag=_lin.zz_diagonal(nmol, i, j)))
        omegas.append(np.pi)
    ham_m = ControlledHamiltonian.create_structured(
        dmol, tuple(structure),
        h0_structure=TermStructure(kind="diag", diag=np.zeros(dmol)),
        dtype=jnp.float32)
    env_m = SimpleEnvelope(basis="bspline", n_basis=n_basis,
                           omegas=tuple(omegas))
    w_m = jnp.asarray(rng.standard_normal(dmol), jnp.float32)
    psi0 = cpx.from_complex(
        np.full(dmol, dmol ** -0.5, np.complex128), jnp.float32)
    assert fused_eligible(ham_m), "molecule set must route to a fused engine"

    def loss_m(c, wv):
        psi = evolve_product_fused(ham_m, env_m, c, psi0, 0.0, 2.0,
                                   horizon=2.0, n_steps=n_steps)
        return jnp.sum(cpx.abs2(psi) * wv, axis=-1)

    cm = jnp.asarray(rng.standard_normal(
        env_m.coeff_shape).astype(np.float32) * 1e-3)
    import jax as _j
    return _j.value_and_grad(loss_m), cm, len(structure), w_m


def main():
    nmol = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    chain = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/diffquantum_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    t0 = time.time()
    print("tunnel probe:", float(jax.jit(lambda x: (x * 2).sum())(
        jnp.ones(8))), f"{time.time() - t0:.2f}s", flush=True)

    g_m, cm, n_ctl, w_m = molecule_grad_fn(nmol, n_steps)
    gj = jax.jit(g_m)
    t0 = time.time()
    v0, g = jax.block_until_ready(gj(cm, w_m))
    print(f"cold value_and_grad ({nmol}q, {n_ctl} controls, "
          f"{n_steps} steps): {time.time() - t0:.1f}s  "
          f"v={float(v0):.6f} |g|={np.linalg.norm(np.asarray(g)):.4g}",
          flush=True)

    rng = np.random.default_rng(7)
    dirn = jnp.asarray(rng.standard_normal(cm.shape).astype(np.float32))
    eps = 1e-3
    lj = jax.jit(lambda c, w: g_m(c, w)[0])
    fd = (float(lj(cm + eps * dirn, w_m))
          - float(lj(cm - eps * dirn, w_m))) / (2 * eps)
    an = float(jnp.sum(g * dirn))
    print(f"FD probe: fd={fd:.6g} adjoint={an:.6g} "
          f"relerr={abs(fd - an) / max(1e-9, abs(fd)):.2e}", flush=True)

    from bench import amortized_step_latency
    per, _ = amortized_step_latency(g_m, cm, chain=chain, n_runs=6,
                                    extra=(w_m,))
    print(f"molecule{nmol}q_hop_grad_step: {per * 1e3:.3f} ms "
          f"(chain={chain}, n_steps={n_steps}, {n_ctl} controls)",
          flush=True)


if __name__ == "__main__":
    main()
