from .mesh import make_mesh, train_energy_seeds, SeedsResult
from .sharded_state import evolve_product_sharded, sharded_diag_expectation
