"""Root-level shim: lets scripts written against the reference's compiled
module (`import diffqc`) run unchanged. The implementation lives in
diffquantum_tpu.compat.diffqc (native C++ engine or numpy fallback)."""
from diffquantum_tpu.compat.diffqc import (  # noqa: F401
    __version__, complex_test, print_test, set_H, test_eigen, trotter)
