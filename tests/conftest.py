"""Test configuration: force a virtual 8-device CPU mesh.

The dev container pins JAX_PLATFORMS=axon (a tunneled TPU) and registers the
axon PJRT plugin from sitecustomize before pytest starts. Tests must run on
CPU with 8 virtual devices; switching the platform at runtime (before any
backend initialization) avoids both the tunneled TPU and the re-exec games a
subprocess approach would need (pytest's fd capture swallows exec'd output).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (already imported by sitecustomize; config still mutable)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import starky_bn254_tpu  # noqa: E402, F401  (sets the persistent compile cache)
