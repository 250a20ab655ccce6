"""Test config: run everything on a virtual 8-device CPU mesh.

The hosting environment pins JAX_PLATFORMS=axon (the TPU tunnel plugin) and
that plugin overrides the env var, so the CPU platform must be forced
through jax.config *before* any backend initialization — the standard JAX
trick for testing pjit/GSPMD sharding without TPU hardware.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: CPU test-suite compiles dominate wall time
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", jax.devices()
