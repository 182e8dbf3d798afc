"""Multi-host initialization (the reference's Horovod rank plumbing,
rlgames_utils.py:71-81, done the JAX way).

On a multi-host TPU slice, call `init_distributed()` once per process
before any other JAX call; all hosts then see the global device set and the
mesh in bez_isaacgym_tpu.parallel.mesh spans DCN+ICI automatically.
"""

from __future__ import annotations

import jax


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> dict:
    """jax.distributed.initialize with TPU auto-detection defaults.

    Returns a summary dict (process index/count, local/global devices).
    Safe to call on a single host: becomes a no-op if there is nothing to
    coordinate.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (ValueError, RuntimeError):
        pass  # single-process / already initialized
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
