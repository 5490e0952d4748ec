"""Model-family coverage: VQE with hardware-realistic (MC) gradients, gate
synthesis fidelity targets, maxcut on a non-ring graph."""
import jax.numpy as jnp
import numpy as np

from diffquantum_tpu.models import control, maxcut, vqe_h2
from diffquantum_tpu.train import TrainConfig, train_energy, train_fidelity

F64 = jnp.float64


def test_vqe_h2_mc_gradients_descend():
    prob = vqe_h2.build_h2(dtype=F64)
    cfg = TrainConfig(n_basis=6, n_epoch=80, lr=5e-2, grad_mode="mc",
                      mc_samples=4, dtype="float64", seed=0, n_step=25)
    res = train_energy(prob.ham, prob.envelope, prob.measurement, prob.psi0,
                       prob.T, cfg)
    # hardware-realistic gradients: from the HF plateau (-1.8302) down to
    # within 5 mHa of the exact ground energy (-1.8512)
    assert res.losses_raw[-1] - prob.exact_ground_energy < 5e-3


def test_hadamard_synthesis_high_fidelity():
    prob = control.hadamard_synthesis(T=2.0, dtype=F64)
    cfg = TrainConfig(n_basis=6, n_epoch=300, lr=1e-1, grad_mode="adjoint",
                      dtype="float64", seed=0)
    res = train_fidelity(prob.ham, prob.envelope, prob.initial_states,
                         prob.target_states, prob.T, cfg, per_pair=False)
    assert res.losses_energy[-1] < 1e-3  # mean fidelity > 0.999


def test_bell_state_preparation():
    prob = control.bell_state_preparation(T=2.0, dtype=F64)
    cfg = TrainConfig(n_basis=6, n_epoch=200, lr=1e-1, grad_mode="adjoint",
                      dtype="float64", seed=1)
    res = train_fidelity(prob.ham, prob.envelope, prob.initial_states,
                         prob.target_states, prob.T, cfg, per_pair=False)
    assert res.losses_energy[-1] < 1e-2


def test_maxcut_nonring_graph():
    # K4 minus an edge; max cut = 4
    graph = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)]
    prob = maxcut.build_maxcut(4, graph, n_basis=6, dtype=F64)
    cfg = TrainConfig(n_basis=6, n_epoch=80, lr=5e-2, grad_mode="adjoint",
                      dtype="float64", seed=0)
    res = train_energy(prob.ham, prob.envelope, prob.measurement, prob.psi0,
                       prob.T, cfg)
    state, cut = prob.readout(res.final_state)
    assert cut == prob.max_cut
