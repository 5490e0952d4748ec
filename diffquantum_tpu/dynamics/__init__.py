from .hamiltonian import ControlledHamiltonian, TermStructure
from .propagator import evolve, trotter, reference_n_steps
from .lindblad import (CollapseSet, amplitude_damping, dephasing,
                       density_from_trajectories, evolve_lindblad,
                       evolve_mcwf, expectation_rho)
