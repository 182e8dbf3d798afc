"""Test configuration.

- FORCES the CPU backend (tests are CPU-by-design; the image sets
  JAX_PLATFORMS=axon and force-registers the tunneled TPU via sitecustomize,
  and a dead tunnel hangs in-process backend init for ~4 minutes — so we
  override, not setdefault, and clear PALLAS_AXON_POOL_IPS so the axon
  plugin fails fast if it is still consulted).
- Requests a virtual 8-device CPU backend (for mesh/sharding tests) via
  XLA_FLAGS; mesh tests grab it explicitly with jax.devices("cpu").
- Enables the persistent compilation cache: XLA:CPU first-compiles are very
  slow in this image (~0.5 s per op), and TPU compiles benefit too.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bez_isaacgym_tpu.utils.backend import force_cpu  # noqa: E402

force_cpu(n_virtual_devices=8)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
