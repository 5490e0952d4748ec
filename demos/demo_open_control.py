"""Noise-aware quantum control: optimize a pulse UNDER decoherence.

Beyond-reference demo. The reference's dynamics are always unitary (noise
enters only as measurement perturbation, `/root/reference/
sim_plain.py:207-208`); here the pulse is trained against the Lindblad
master equation (differentiable through the dissipative propagator), so the
optimizer learns to beat T1 relaxation — e.g. by driving faster than the
naive noise-blind pulse.

Task: |0> -> |1> on a damped qubit (amplitude damping rate gamma). Compare
  (a) a noise-blind pulse: trained on the closed system, evaluated open;
  (b) a noise-aware pulse: trained directly on the open system.
Both are then cross-validated with Monte-Carlo wavefunction trajectories.

``--mcwf-scale N`` (N >= 10) adds a second act PAST the density-matrix
wall: T1-aware maxcut pulse training at N qubits through the
score-function MCWF estimator (`evolve_mcwf_structured(return_logp=True)`
+ `score_surrogate`) — no [d, d] operator is ever built, so this runs at
sizes where rho (d^2 entries) is impossible.

Usage: python demos/demo_open_control.py [--gamma 0.15] [--epochs 300]
       [--mcwf-scale 14]
"""
import argparse
import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from diffquantum_tpu.dynamics.lindblad import (  # noqa: E402
    CollapseSet, amplitude_damping, density_from_trajectories,
    evolve_lindblad, evolve_mcwf, expectation_rho)
from diffquantum_tpu.models import control  # noqa: E402
from diffquantum_tpu.ops import cpx  # noqa: E402
from diffquantum_tpu.pulses.envelope import SimpleEnvelope  # noqa: E402
from diffquantum_tpu.train import TrainConfig, train_fidelity  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gamma", type=float, default=0.15)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--T", type=float, default=2.0)
    p.add_argument("--lr", type=float, default=1e-1)
    p.add_argument("--n-traj", type=int, default=2000)
    p.add_argument("--mcwf-scale", type=int, default=0,
                   help="if >= 10: also run T1-aware training at this "
                        "many qubits via the score-function MCWF "
                        "estimator (past the density-matrix wall)")
    p.add_argument("--mcwf-epochs", type=int, default=30)
    p.add_argument("--mcwf-backend", default="auto",
                   choices=["auto", "xla", "fused"])
    args = p.parse_args()

    ham, omegas = control.single_qubit_controls(detuning=0.5)
    env = SimpleEnvelope(basis="bspline", n_basis=6, omegas=omegas)
    T, n_steps = args.T, 10 * (int(args.T) + 1)
    c = CollapseSet.create([amplitude_damping(args.gamma, 0, 1)])
    psi0 = cpx.from_complex(np.array([1.0, 0.0]))
    rho0 = cpx.from_complex(np.array([[1.0, 0.0], [0.0, 0.0]]))
    target_diag = jnp.asarray([0.0, 1.0], jnp.float32)  # <1|rho|1>

    # (a) noise-blind: closed-system training (reference-style objective)
    cfg = TrainConfig(n_basis=6, n_epoch=args.epochs, lr=args.lr,
                      grad_mode="adjoint", seed=0)
    blind = train_fidelity(
        ham, env, cpx.CP(psi0.re[None], psi0.im[None]),
        cpx.from_complex(np.array([[0.0, 1.0]])), T, cfg).coeff

    # (b) noise-aware: train through the master equation
    def open_infidelity(coeff):
        rho = evolve_lindblad(ham, env, coeff, rho0, c, 0.0, T,
                              horizon=T, n_steps=n_steps)
        return 1.0 - expectation_rho(target_diag, rho)

    opt = optax.adam(args.lr)
    coeff = env.init_coeff(jax.random.PRNGKey(0), scale=1.0)
    state = opt.init(coeff)

    @jax.jit
    def train_step(coeff, state):
        loss, g = jax.value_and_grad(open_infidelity)(coeff)
        updates, state = opt.update(g, state, coeff)
        return optax.apply_updates(coeff, updates), state, loss

    for epoch in range(1, args.epochs + 1):
        coeff, state, loss = train_step(coeff, state)
        if epoch % 50 == 0:
            print(f"epoch {epoch:04d}  open-system infidelity {loss:.4f}")

    f_blind = 1.0 - float(open_infidelity(blind))
    f_aware = 1.0 - float(open_infidelity(coeff))
    print(f"\ngamma = {args.gamma}, T = {T}")
    print(f"noise-blind pulse, open-system fidelity:  {f_blind:.4f}")
    print(f"noise-aware pulse, open-system fidelity:  {f_aware:.4f}")
    print(f"advantage: {f_aware - f_blind:+.4f}")

    # cross-validate the winner with quantum-jump trajectories
    psis = evolve_mcwf(ham, env, coeff, psi0, c, 0.0, T, horizon=T,
                       n_steps=n_steps, key=jax.random.PRNGKey(1),
                       n_traj=args.n_traj)
    rho_mc = density_from_trajectories(psis)
    f_mc = float(expectation_rho(target_diag, rho_mc))
    print(f"MCWF check ({args.n_traj} trajectories): fidelity {f_mc:.4f} "
          f"(master equation: {f_aware:.4f})")

    if args.mcwf_scale >= 10:
        mcwf_scale_act(args.mcwf_scale, args.mcwf_epochs,
                       args.mcwf_backend)


def mcwf_scale_act(n: int, epochs: int, backend: str = "auto"):
    """T1-aware maxcut training at n qubits — density matrices are d^2 and
    impossible here; the score-function MCWF estimator is O(d) per
    trajectory. ``backend='fused'`` runs all trajectories lockstep
    through one batched Pallas rotation block per step (the 16q+ on-chip
    path); 'auto' picks fused at >= 14 qubits."""
    from diffquantum_tpu.dynamics.lindblad import (StructuredNoise,
                                                   evolve_mcwf_structured,
                                                   score_surrogate)
    from diffquantum_tpu.models import maxcut

    print(f"\n--- T1-aware training at {n} qubits "
          f"(score-function MCWF; rho would be 2^{2 * n} entries) ---")
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4,
                               dense=False)
    noise = StructuredNoise(n, t1=[(q, 0.1) for q in range(n)])
    w = prob.measurement.diag
    T, n_steps, n_traj = float(prob.T), 10, 8
    if backend == "auto":
        backend = "fused" if n >= 14 else "xla"
    print(f"(trajectory engine: backend={backend})")

    def loss(cc, key):
        psis, logps = evolve_mcwf_structured(
            prob.ham, prob.envelope, cc, prob.psi0, noise, 0.0, T,
            horizon=T, n_steps=n_steps, key=key, n_traj=n_traj,
            return_logp=True, backend=backend)
        vals = jnp.sum(cpx.abs2(psis) * w, axis=-1)
        return score_surrogate(vals, logps)

    opt = optax.adam(5e-2)
    cc = prob.envelope.init_coeff(jax.random.PRNGKey(0), scale=0.3)
    state = opt.init(cc)

    @jax.jit
    def train_step(cc, state, key):
        val, g = jax.value_and_grad(loss)(cc, key)
        updates, state = opt.update(g, state, cc)
        return optax.apply_updates(cc, updates), state, val

    key = jax.random.PRNGKey(7)
    first = None
    for epoch in range(1, epochs + 1):
        key, sub = jax.random.split(key)
        cc, state, val = train_step(cc, state, sub)
        if first is None:
            first = float(val)
        if epoch % max(1, epochs // 5) == 0:
            print(f"epoch {epoch:04d}  noisy maxcut energy {val:.4f}")
    print(f"noisy energy: first {first:.4f} -> last {float(val):.4f} "
          f"(T1 on every qubit, gamma=0.1)")


if __name__ == "__main__":
    main()
