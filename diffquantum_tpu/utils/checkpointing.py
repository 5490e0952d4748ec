"""Checkpoint / resume for training state.

The reference has none (SURVEY.md §5: "Training state lives only in
self.spectral_coeff in memory"). Here: msgpack serialization (via
flax.serialization) of the full training pytree — coefficients, optimizer
state, PRNG key, epoch — with atomic file replacement so an interrupted
write never corrupts the latest checkpoint.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(directory: str, state: dict, name: str = "ckpt") -> str:
    """Serialize ``state`` (a pytree dict) to ``<directory>/<name>.msgpack``
    atomically. Returns the final path."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{name}.msgpack")
    tmp = path + ".tmp"
    # to_state_dict flattens NamedTuple pytrees (e.g. optax states) into
    # plain dicts that msgpack can carry
    data = serialization.msgpack_serialize(
        serialization.to_state_dict(_to_numpy(state)))
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def load_checkpoint(directory: str, name: str = "ckpt") -> dict:
    path = os.path.join(directory, f"{name}.msgpack")
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())
