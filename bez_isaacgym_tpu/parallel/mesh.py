"""Mesh construction and canonical shardings.

The engine's dominant parallel axis is the environment/solve batch ("env"),
sharded across every chip; model/solver parameters are replicated.  This is
the faithful TPU mapping of the reference's parallelism inventory
(SURVEY.md §2.4): PhysX's 4096-env single-GPU batch -> vmap + env-axis
sharding; Horovod DP -> psum over the mesh.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def env_mesh(devices=None, axis: str = ENV_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    import numpy as np

    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (axis,))


def env_sharding(mesh: Mesh, axis: str = ENV_AXIS) -> NamedSharding:
    """Batch-axis sharding: leading (env) dim split across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
