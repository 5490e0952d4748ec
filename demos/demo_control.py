"""Quantum optimal control demos: state transfer, Bell-state preparation and
Hadamard gate synthesis (reference README TODOs,
`/root/reference/README.md:28-31`, completed here).

Usage:
    python demos/demo_control.py [--task transfer|bell|hadamard] [--grad adjoint|mc]
"""
import argparse
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from diffquantum_tpu.models import control  # noqa: E402
from diffquantum_tpu.train import TrainConfig, train_fidelity  # noqa: E402
from diffquantum_tpu.utils.logger import Logger  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="transfer",
                   choices=["transfer", "bell", "hadamard"])
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--grad", default="adjoint", choices=["adjoint", "mc"])
    p.add_argument("--lr", type=float, default=1e-1)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    if args.task == "transfer":
        prob = control.state_transfer(n_qubits=1)
    elif args.task == "bell":
        prob = control.bell_state_preparation()
    else:
        prob = control.hadamard_synthesis()

    logger = Logger(name=f"control_{args.task}_{args.grad}")
    cfg = TrainConfig(n_basis=6, n_epoch=args.epochs, lr=args.lr,
                      grad_mode=args.grad, seed=args.seed)
    res = train_fidelity(prob.ham, prob.envelope, prob.initial_states,
                         prob.target_states, prob.T, cfg, logger=logger)

    infid = res.losses_energy[-1]
    print(f"task: {args.task}")
    print(f"final mean infidelity: {infid:.2e} (fidelity {1 - infid:.6f})")
    from diffquantum_tpu.ops import cpx
    finals = cpx.to_complex(res.final_state)
    targets = cpx.to_complex(prob.target_states)
    fids = np.abs(np.sum(np.conj(targets) * finals, axis=-1)) ** 2
    for i, f in enumerate(fids):
        print(f"  pair {i}: fidelity {f:.6f}")


if __name__ == "__main__":
    main()
