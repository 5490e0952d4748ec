"""Test configuration: run on CPU with a fake 8-device mesh.

Multi-chip sharding tests run on a virtual device mesh via
``--xla_force_host_platform_device_count=8`` — the JAX-native analog of a
fake distributed backend (the reference has nothing distributed to fake;
see SURVEY.md §4). Must be set before jax initializes.
"""
import os

# The environment pre-exports JAX_PLATFORMS=axon (remote TPU tunnel) and a
# sitecustomize hook sets jax_platforms="axon,cpu" at interpreter start, so
# env vars alone don't stick — override the live jax config instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
