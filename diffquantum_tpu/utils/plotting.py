"""Control-waveform plotting.

The reference ships a ``save_plot`` that is dead code — disabled by an
early ``return`` (`/root/reference/sim_plain.py:233-243`). This is the
working version: sample every control envelope u_k(t) on a grid and save a
labeled matplotlib figure. matplotlib is imported lazily and failure to
import degrades to a no-op (TPU pods may not have display stacks).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def save_pulse_plot(envelope, coeff, T: float, path: str,
                    n_points: int = 200) -> bool:
    """Render u_k(t) for all controls to ``path``. Returns True on success."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return False
    ts = np.linspace(0.0, T, n_points, endpoint=False)
    u = np.asarray(envelope.amplitudes(jnp.asarray(np.asarray(coeff)),
                                       jnp.asarray(ts), T))
    fig, ax = plt.subplots(figsize=(8, 4))
    for k in range(u.shape[0]):
        ax.plot(ts, u[k], label=f"u_{k}")
    ax.set_xlabel("t")
    ax.set_ylabel("drive amplitude")
    ax.legend(loc="upper right", ncol=2, fontsize=7)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return True
