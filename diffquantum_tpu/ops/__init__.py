from . import linalg
from . import expm
