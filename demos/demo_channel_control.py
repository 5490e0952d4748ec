"""Carrier-resolved entangling control with the CHANNEL pulse model.

The reference's C++ backend carries a richer pulse model than its Python
demos ever exercised: per-control *channels* with a carrier frequency and
two trainable quadratures,

    u_h(t) = omega (2 sigmoid(N) - 1) / N * (A(t) cos(w t) + B(t) sin(w t)),

with A/B basis expansions of the spectral coefficients
(`/root/reference/diffqc.cc:95-135` — the IBM-pulse-like model its
git-ignored `test_ibmsim.py` targeted). This demo trains that model
end-to-end on a physical task the simple envelope cannot express naturally:
two DETUNED qubits under an always-on ZZ coupling, each driven through its
own resonant carrier, steered into a Bell state.

    H(t) = w1/2 Z1 + w2/2 Z2 + J ZZ + u1(t) X1 + u2(t) X2

The carriers (w = qubit frequency) let slowly-varying A/B quadratures
address each qubit in its own rotating frame — exactly how hardware drive
lines work.

Run:  python demos/demo_channel_control.py [--epochs 400] [--seeds 4]
Healthy: best Bell fidelity > 0.99 (typically ~0.999 by epoch ~300).
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from diffquantum_tpu.dynamics.hamiltonian import \
    ControlledHamiltonian  # noqa: E402
from diffquantum_tpu.dynamics.propagator import (evolve,  # noqa: E402
                                                 reference_n_steps)
from diffquantum_tpu.measure import target_overlap_prob  # noqa: E402
from diffquantum_tpu.ops import cpx, linalg  # noqa: E402
from diffquantum_tpu.pulses.envelope import ChannelEnvelope  # noqa: E402
from diffquantum_tpu.utils.logger import Logger  # noqa: E402


def build(n_basis=8, func_type=1):
    w1, w2, jzz = 5.0, 5.8, 0.5
    h0 = (0.5 * w1 * linalg.pauli_string("ZI")
          + 0.5 * w2 * linalg.pauli_string("IZ")
          + jzz * linalg.pauli_string("ZZ"))
    hs = [linalg.pauli_string("XI"), linalg.pauli_string("IX")]
    ham = ControlledHamiltonian.create(h0, hs, dtype=jnp.float32)
    # one channel per drive line, carrier at the qubit frequency
    # (rows = the reference's channel table [_, omega, w, idx],
    #  diffqc.cc:103-111)
    rows = [[[0.0, 1.2, w1, 0]],
            [[0.0, 1.2, w2, 1]]]
    env = ChannelEnvelope.from_rows(rows, n_basis=n_basis,
                                    func_type=func_type)
    psi0 = cpx.from_complex(linalg.basis_state(0, 4), jnp.float32)
    bell = np.zeros(4, complex)
    bell[0] = bell[3] = 1 / np.sqrt(2)
    target = cpx.from_complex(bell, jnp.float32)
    return ham, env, psi0, target


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--T", type=float, default=6.0)
    ap.add_argument("--per-step", type=int, default=120)
    ap.add_argument("--lr", type=float, default=3e-2)
    args = ap.parse_args()

    log = Logger("demo_channel_control")
    ham, env, psi0, target = build()
    T = args.T
    # the carrier at w ~ 5-6 rad/time needs ~20 grid points per period
    n_steps = reference_n_steps(args.per_step, 0.0, T)

    def infidelity(vv):
        psi = evolve(ham, env, vv, psi0, 0.0, T, horizon=T,
                     n_steps=n_steps, t_sample="mid")
        return 1.0 - target_overlap_prob(target, psi)

    grad_fn = jax.jit(jax.value_and_grad(
        lambda vvs: jax.vmap(infidelity)(vvs).sum(),
        has_aux=False))

    key = jax.random.PRNGKey(0)
    vvs = jax.vmap(lambda k: env.init_coeff(k, scale=0.3))(
        jax.random.split(key, args.seeds))
    opt = optax.adam(args.lr)
    state = opt.init(vvs)

    t0 = time.time()
    best = 1.0
    for epoch in range(1, args.epochs + 1):
        total, g = grad_fn(vvs)
        updates, state = opt.update(g, state, vvs)
        vvs = optax.apply_updates(vvs, updates)
        if epoch % 20 == 0 or epoch == args.epochs:
            infs = np.asarray(jax.vmap(infidelity)(vvs))
            best = float(infs.min())
            log.write_text(f"epoch: {epoch:04d}, best infidelity: "
                           f"{best:.6f}, mean: {float(infs.mean()):.6f}")
    log.write_text(f"best Bell fidelity: {1.0 - best:.6f} "
                   f"({args.seeds} seeds, channel/carrier pulse model)")
    log.write_text(f"wall time: {time.time() - t0:.1f}s")
    return 1.0 - best


if __name__ == "__main__":
    main()
