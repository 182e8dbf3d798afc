"""Data-parallel MPC: shard the solve axis over the device mesh.

Each chip runs its slice of the S parallel MPC problems (physics batch
S_local * K rollouts); solves are independent, so the only cross-chip
traffic is the initial sharding — the scaling mode BASELINE.json's
multi-host config measures (8192+ solves across v5p-16).
"""

from __future__ import annotations

import jax
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from bez_isaacgym_tpu.parallel.mesh import ENV_AXIS


def data_parallel_mpc(solver, mesh):
    """Returns jitted solve(env_states, solver_states, key) with the leading
    (solve) axis sharded over `mesh`; the PRNG key is folded per shard."""

    def local_solve(env_states, solver_states, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(ENV_AXIS))
        return solver.solve(env_states, solver_states, key)

    sharded = shard_map(
        local_solve, mesh=mesh,
        in_specs=(P(ENV_AXIS), P(ENV_AXIS), P()),
        out_specs=(P(ENV_AXIS), P(ENV_AXIS), P(ENV_AXIS)),
        check_rep=False,
    )
    return jax.jit(sharded)
