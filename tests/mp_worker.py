"""Worker process for the multi-host data-parallel parity test.

Not a pytest file: spawned by tests/test_multihost.py, one OS process per
"host", each with 2 virtual CPU devices (env set by the spawner).  Runs
init_distributed -> 4-global-device mesh -> ONE data_parallel_ppo train
iteration, and dumps the resulting (replicated) parameters + metrics to an
npz so the parent can assert single-process/multi-process parity — the
jax-native exercise of the reference's Horovod multi-GPU path
(/root/reference/bez_isaacgym/utils/rlgames_utils.py:71-81, one process per
GPU + gradient allreduce), per SURVEY.md §4's multi-host test plan.

Usage: python mp_worker.py <nprocs> <pid> <port> <out.npz>
"""

import sys

NPROCS, PID, PORT, OUT = (int(sys.argv[1]), int(sys.argv[2]),
                          sys.argv[3], sys.argv[4])

import jax  # noqa: E402

if NPROCS > 1:
    # CPU cross-process collectives ride gloo (config must precede backend
    # init); single-process mode skips coordination entirely.
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from bez_isaacgym_tpu.parallel.distributed import init_distributed  # noqa: E402
from bez_isaacgym_tpu.parallel.mesh import env_mesh  # noqa: E402
from bez_isaacgym_tpu.parallel.dp import data_parallel_ppo  # noqa: E402
from bez_isaacgym_tpu.rl.ppo import PPOConfig  # noqa: E402
from bez_isaacgym_tpu.tasks.base import TaskConfig  # noqa: E402
from bez_isaacgym_tpu.tasks.kick import KickTask  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

if NPROCS > 1:
    info = init_distributed(coordinator_address=f"127.0.0.1:{PORT}",
                            num_processes=NPROCS, process_id=PID)
    assert info["process_count"] == NPROCS, info
else:
    info = init_distributed()

devices = jax.devices()
assert len(devices) == 4, devices   # 4 global = nprocs x (4/nprocs) local
mesh = env_mesh(devices)


def make_global(host_value, spec):
    """Build a global jax.Array from an identical host value on every
    process (each process contributes only its addressable shards)."""
    def cb(leaf):
        arr = np.asarray(leaf)
        return jax.make_array_from_callback(
            arr.shape, NamedSharding(mesh, spec), lambda idx: arr[idx])
    return jax.tree.map(cb, host_value)


NUM_ENVS = 16
task = KickTask(TaskConfig(substeps=1, use_pallas=False))
cfg = PPOConfig(horizon=2, minibatch_size=NUM_ENVS * 2, mini_epochs=1,
                units=(16, 16))
init_fn, train_iter, _ = data_parallel_ppo(task, NUM_ENVS, mesh, cfg)

ts = make_global(init_fn(jax.random.PRNGKey(0)), P())
keys = jax.random.split(jax.random.PRNGKey(1), NUM_ENVS)
env_state = make_global(jax.jit(jax.vmap(task.reset_one))(keys), P("env"))
obs = make_global(jnp.zeros((NUM_ENVS, task.num_obs), jnp.float32), P("env"))

ts2, env_state, obs, metrics = train_iter(ts, env_state, obs)

# Replicated outputs: every device's shard is the full value.
params_flat = np.concatenate([
    np.asarray(leaf.addressable_data(0)).ravel()
    for leaf in jax.tree.leaves(ts2.params)])
metrics_np = {k: float(np.asarray(v.addressable_data(0)))
              for k, v in metrics.items()}
np.savez(OUT, params=params_flat,
         **{f"metric_{k}": v for k, v in metrics_np.items()},
         process_count=info["process_count"],
         global_devices=len(devices))
print(f"worker {PID}/{NPROCS} ok: {len(params_flat)} params, "
      f"kl={metrics_np.get('kl'):.6f}", flush=True)

if NPROCS > 1:
    jax.distributed.shutdown()
