"""Test configuration.

- Requests a virtual 8-device CPU backend (for mesh/sharding tests) via
  XLA_FLAGS; mesh tests grab it explicitly with jax.devices("cpu") because
  the image's sitecustomize force-registers the tunneled TPU ("axon") ahead
  of JAX_PLATFORMS, so the *default* backend may be that single TPU.
- Enables the persistent compilation cache: XLA:CPU first-compiles are very
  slow in this image (~0.5 s per op), and TPU compiles benefit too.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
