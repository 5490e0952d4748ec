"""VQE for the H2 ground state with analog pulses (reference README TODO,
`/root/reference/README.md:25-27`, completed here).

Usage:
    python demos/demo_vqe_h2.py [--epochs 250] [--grad adjoint|mc|fd]
"""
import argparse
import sys

sys.path.insert(0, ".")

from diffquantum_tpu.models import vqe_h2  # noqa: E402
from diffquantum_tpu.train import TrainConfig, train_energy  # noqa: E402
from diffquantum_tpu.utils.logger import Logger  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=250)
    p.add_argument("--grad", default="adjoint", choices=["adjoint", "mc", "fd"])
    p.add_argument("--lr", type=float, default=1e-1)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    prob = vqe_h2.build_h2()
    logger = Logger(name=f"vqe_h2_{args.grad}")
    cfg = TrainConfig(n_basis=6, n_epoch=args.epochs, lr=args.lr,
                      grad_mode=args.grad, seed=args.seed)
    res = train_energy(prob.ham, prob.envelope, prob.measurement, prob.psi0,
                       prob.T, cfg, logger=logger)

    final = res.losses_raw[-1]
    print(f"final energy:  {final:.6f} Ha")
    print(f"exact ground:  {prob.exact_ground_energy:.6f} Ha")
    print(f"error:         {(final - prob.exact_ground_energy) * 1000:.3f} mHa "
          f"(chemical accuracy: 1.6 mHa)")


if __name__ == "__main__":
    main()
