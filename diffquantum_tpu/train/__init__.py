from .config import TrainConfig
from .energy import train_energy, train_energy_fd, TrainResult
from .fidelity import train_fidelity
from .gate import train_gate
