from .adjoint import energy_and_grad, fidelity_and_grad
from .mc import mc_energy_grad, mc_energy_grad_batch, envelope_sensitivity
from .fd import fd_energy_grad
