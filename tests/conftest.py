"""Test configuration: force a virtual 8-device CPU mesh before JAX loads.

All tests run on CPU with 8 virtual devices so the multi-chip sharding path
(parallel/) is exercised without TPU hardware.

This container registers an `axon` TPU PJRT plugin from sitecustomize.py when
PALLAS_AXON_POOL_IPS is set, and with that plugin registered `import jax`
blocks on the TPU relay even under JAX_PLATFORMS=cpu. Tests therefore re-exec
the interpreter once with the axon env stripped before anything imports jax.
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(
    "_STARKY_TEST_REEXEC"
):
    env = dict(os.environ)
    env["_STARKY_TEST_REEXEC"] = "1"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the field/NTT/Poseidon graphs are large
# unrolled op chains; caching makes repeat test runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/starky_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
