"""Test configuration: force CPU backend with a virtual 8-device mesh.

Mirrors SURVEY.md §4's implication: the reference's tests need a real GPU;
ours must run anywhere.  Multi-chip sharding tests use the 8 virtual CPU
devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# XLA:CPU first-compiles are very slow in this image (~0.5 s per op); the
# persistent cache makes repeat test runs orders of magnitude faster.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
