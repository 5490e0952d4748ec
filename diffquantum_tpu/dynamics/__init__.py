from .hamiltonian import ControlledHamiltonian, TermStructure
from .propagator import evolve, trotter, reference_n_steps
