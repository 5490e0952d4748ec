"""Pulse-level VQE on the transverse-field Ising chain.

The cost Hamiltonian has off-diagonal (X) terms, so this exercises the
matrix-free Pauli-string measurement — general VQE at sizes where no dense
cost operator can exist. Ground truth at ANY size from the free-fermion
solution (models/tfim.py).

Usage: python demos/demo_tfim.py [--n 10] [--epochs 300] [--grad adjoint|mc]
"""
import argparse
import sys

sys.path.insert(0, ".")

from diffquantum_tpu.models import tfim  # noqa: E402
from diffquantum_tpu.train import TrainConfig, train_energy  # noqa: E402
from diffquantum_tpu.utils.logger import Logger  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=10)
    p.add_argument("--J", type=float, default=1.0)
    p.add_argument("--h", type=float, default=1.0)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--grad", default="adjoint", choices=["adjoint", "mc"])
    p.add_argument("--lr", type=float, default=5e-2)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    prob = tfim.build_tfim(args.n, J=args.J, h=args.h, n_basis=6,
                           n_layers=args.layers)
    cfg = TrainConfig(n_basis=6, n_epoch=args.epochs, lr=args.lr,
                      grad_mode=args.grad, seed=args.seed)
    logger = Logger(name=f"tfim_{args.n}q_{args.grad}")
    res = train_energy(prob.ham, prob.envelope, prob.measurement, prob.psi0,
                       prob.T, cfg, logger=logger,
                       lam_min=prob.exact_ground)

    e_final = res.losses_raw[-1]
    print(f"TFIM chain: n={args.n}, J={args.J}, h={args.h} "
          f"(criticality J=h)")
    print(f"final energy:        {e_final:.6f}")
    print(f"free-fermion ground: {prob.exact_ground:.6f}")
    print(f"gap: {res.losses_energy[-1]:.6f} "
          f"({100 * res.losses_energy[-1] / abs(prob.exact_ground):.2f}% "
          f"of |E0|)")


if __name__ == "__main__":
    main()
