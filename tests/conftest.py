"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment pins JAX_PLATFORMS=axon (the TPU tunnel); tests override to
CPU with 8 virtual devices so sharding/collective tests run anywhere.
XLA_FLAGS must be set before the first jax import in the process.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.device_count() >= 8, jax.devices()
