"""Device-mesh parallelism: sharding helpers and data-parallel training.

TPU-native replacement for the reference's optional Horovod data parallelism
(/root/reference/bez_isaacgym/utils/rlgames_utils.py:71-81): instead of one
process per GPU with NCCL allreduce, a `jax.sharding.Mesh` over all chips,
env-axis sharding for simulation/rollouts, and XLA psum collectives over ICI
for gradient reduction.
"""

from bez_isaacgym_tpu.parallel.mesh import (env_mesh, env_sharding,  # noqa: F401
                                            replicated)
from bez_isaacgym_tpu.parallel.dp import data_parallel_ppo  # noqa: F401
