"""Roofline / MFU accounting for the fused evolution kernels.

Counts the arithmetic each workload performs (analytically, from the
kernel structure — not XLA cost models), measures the amortized device
latency the same way bench.py does, and reports achieved FLOP/s as a
fraction of the chip's peaks. Run on the real TPU:

    nohup python scripts/roofline.py > /tmp/roofline.log 2>&1 &

Peaks used (TPU v5e, one core):
  MXU: ~197 TFLOP/s bf16; full-f32 (3-pass) effective ~ 1/3 of that.
  VPU: ~8x128 lanes x ~0.94 GHz x 2 (FMA) ~ 1.9 TFLOP/s (elementwise).
  HBM: ~820 GB/s.

The fused kernels' arithmetic splits into (a) lane-qubit rotations — MXU
[R,128]x[128,128] permutation matmuls, the only MXU term — and (b)
everything else (phases, row flips, gradient reductions) on the VPU. The
packed-phase form (round 3) removed the [n_steps, d] HBM angle streams,
so HBM traffic per step is near zero for VMEM-resident states; the
chunked engine reads+writes the state twice per step.
"""
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

MXU_BF16 = 197e12
MXU_F32 = MXU_BF16 / 3.0     # 3-pass bf16 = full f32 precision
VPU = 1.9e12
HBM = 820e9


def fused_flops(n, n_steps, n_diag, n_rot, precision="full",
                backward=True):
    """Analytic per-evolution FLOP count for the packed fused kernel.

    Returns dict with mxu (counted as f32-precision MACs x2), vpu
    (elementwise op count), hbm_bytes."""
    d = 2**n
    r = d // 128
    # ring drive layout: one X per qubit -> lane rots = min(n_rot, 7)
    lane_rots = min(n_rot, 7)
    row_rots = n_rot - lane_rots

    # forward, per step:
    #   phases (x2): theta build ~3 ops/term + trig(~8) + 4-mul complex
    vpu = 2 * (3 * n_diag + 8 + 6) * d
    #   row rotations: 2 planes x (flip copy + 2 mul + add) ~ 6 ops
    vpu += row_rots * 6 * d
    #   lane rotations: 2 matmuls (G on each plane) + 4 muls/adds
    mxu = lane_rots * 2 * (2 * r * 128 * 128)
    vpu += lane_rots * 6 * d
    fwd_mxu, fwd_vpu = mxu, vpu
    total_mxu = fwd_mxu * n_steps
    total_vpu = fwd_vpu * n_steps
    if backward:
        # backward step: exactly 2x the forward rotation matmuls — 4
        # generator applications per rotation (G(y) planes + G(lam)
        # planes; G(x) derived via G^2 = I / K^2 = -I, the involution
        # identity) — phases ~2x, per-term gradient reductions ~4
        # ops/term/elem at two stages
        total_mxu += 2 * fwd_mxu * n_steps
        total_vpu += (2 * fwd_vpu + 2 * (4 * n_diag) * d) * n_steps
    hbm = 0  # packed: angle rows are KBs; state is VMEM-resident
    return {"mxu": total_mxu, "vpu": total_vpu, "hbm": hbm}


def measure(step_fn, arg, chain=50, n_runs=6):
    import jax

    def chained(c):
        def body(c, _):
            _, g = step_fn(c)
            return c - 1e-6 * g, None
        return jax.lax.scan(body, c, None, length=chain)[0]

    f = jax.jit(chained)
    jax.block_until_ready(f(arg))
    ts = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        jax.block_until_ready(f(arg))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / chain


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/diffquantum_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from diffquantum_tpu.dynamics.product import evolve_product_fused
    from diffquantum_tpu.models import maxcut
    from diffquantum_tpu.ops import cpx

    rows = []
    for n, n_steps, chain in ((12, 30, 100), (16, 1000, 4), (18, 30, 20),
                              (20, 30, 6)):
        prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=6,
                                   dense=False)

        def loss(c, _p=prob, _ns=n_steps):
            psi = evolve_product_fused(_p.ham, _p.envelope, c, _p.psi0,
                                       0.0, _p.T, horizon=_p.T,
                                       n_steps=_ns)
            return jnp.sum(cpx.abs2(psi) * _p.measurement.diag, axis=-1)

        rng = np.random.default_rng(0)
        c0 = jnp.asarray(rng.standard_normal(
            prob.envelope.coeff_shape).astype(np.float32) * 1e-3)
        t = measure(jax.value_and_grad(loss), c0, chain=chain)
        fl = fused_flops(n, n_steps, n_diag=n, n_rot=n)
        mxu_frac = fl["mxu"] / t / MXU_F32
        vpu_frac = fl["vpu"] / t / VPU
        rows.append({
            "workload": f"{n}q x {n_steps}-step grad step",
            "latency_ms": round(t * 1e3, 3),
            "mxu_gflop": round(fl["mxu"] / 1e9, 2),
            "vpu_gop": round(fl["vpu"] / 1e9, 2),
            "mxu_frac_of_f32_peak": round(mxu_frac, 4),
            "vpu_frac_of_peak": round(vpu_frac, 4),
            "bound": "MXU" if mxu_frac > vpu_frac else "VPU",
        })
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"summary": rows}, indent=1))


if __name__ == "__main__":
    main()
