"""Root-level shim: lets scripts written against the reference
(`from sim_plain import SimulatorPlain`) run unchanged on this framework.
The implementation lives in diffquantum_tpu.compat.sim_plain."""
from diffquantum_tpu.compat.sim_plain import SimulatorPlain  # noqa: F401
