"""Pulse-level QAOA MaxCut demo — the reference's flagship workload
(`/root/reference/demo_maxcut.py`) on the TPU-native stack.

Usage:
    python demos/demo_maxcut.py [--qubits 4] [--epochs 202] [--grad adjoint|mc|fd]
"""
import argparse
import sys

sys.path.insert(0, ".")


from diffquantum_tpu.models import maxcut  # noqa: E402
from diffquantum_tpu.train import TrainConfig, train_energy  # noqa: E402
from diffquantum_tpu.utils.logger import Logger  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--qubits", type=int, default=4)
    p.add_argument("--epochs", type=int, default=202)
    p.add_argument("--grad", default="adjoint", choices=["adjoint", "mc", "fd"])
    p.add_argument("--lr", type=float, default=2e-2)
    p.add_argument("--n-basis", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    if args.qubits == 4:
        prob = maxcut.demo_problem()  # the reference's 4-qubit ring
    else:
        prob = maxcut.build_maxcut(args.qubits, maxcut.ring_graph(args.qubits),
                                   n_basis=args.n_basis)

    logger = Logger(name=f"maxcut_{args.grad}")
    logger.write_text(f"demo_MaxCut n_qubits={args.qubits} ========")
    logger.write_text(f"sim.T: {prob.T}")

    cfg = TrainConfig(n_basis=args.n_basis, n_epoch=args.epochs, lr=args.lr,
                      grad_mode=args.grad, seed=args.seed)
    res = train_energy(prob.ham, prob.envelope, prob.measurement, prob.psi0,
                       prob.T, cfg, logger=logger)

    state, cut = prob.readout(res.final_state)
    print(f"cut result is {bin(state)[2:].zfill(prob.n_qubits)}")
    print(f"cut value: {cut} / max cut: {prob.max_cut}")
    print(f"final optimality gap: {res.losses_energy[-1]:.6f}")
    print(f"wall time: {res.wall_s:.1f}s ({args.epochs} epochs, "
          f"{args.grad} gradients)")


if __name__ == "__main__":
    main()
