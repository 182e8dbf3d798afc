"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bez_isaacgym_tpu.parallel.mesh import env_mesh, env_sharding, replicated


@pytest.fixture(scope="module")
def mesh():
    # Explicitly request the CPU backend: the image's sitecustomize
    # force-registers the tunneled TPU ahead of JAX_PLATFORMS, so the
    # default backend may be a single TPU even under the test env vars.
    devices = jax.devices("cpu")
    assert len(devices) >= 8, "conftest sets 8 virtual CPU devices"
    return env_mesh(devices[:8])


def test_mesh_construction(mesh):
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("env",)


def test_env_sharding_placement(mesh):
    x = jnp.arange(16.0).reshape(16, 1)
    xs = jax.device_put(x, env_sharding(mesh))
    assert len(xs.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


@pytest.mark.slow
def test_data_parallel_ppo_step(mesh):
    """One sharded PPO train iteration compiles and runs (the driver's
    dryrun_multichip path)."""
    from bez_isaacgym_tpu.parallel.dp import data_parallel_ppo
    from bez_isaacgym_tpu.rl.ppo import PPOConfig
    from bez_isaacgym_tpu.tasks.kick import KickTask
    from bez_isaacgym_tpu.tasks.base import TaskConfig

    num_envs = 16
    task = KickTask(TaskConfig(substeps=2, use_pallas=False))
    cfg = PPOConfig(horizon=2, minibatch_size=num_envs * 2, mini_epochs=1,
                    units=(16, 16))
    init_fn, train_iter, _ = data_parallel_ppo(task, num_envs, mesh, cfg)
    ts = jax.device_put(init_fn(jax.random.PRNGKey(0)), replicated(mesh))
    keys = jax.random.split(jax.random.PRNGKey(1), num_envs)
    env_state = jax.device_put(jax.jit(jax.vmap(task.reset_one))(keys),
                               env_sharding(mesh))
    obs = jax.device_put(jnp.zeros((num_envs, task.num_obs), jnp.float32),
                         env_sharding(mesh))
    ts, env_state, obs, metrics = train_iter(ts, env_state, obs)
    for v in metrics.values():
        assert np.isfinite(float(v))


@pytest.mark.slow
def test_data_parallel_mpc(mesh):
    """Sharded MPPI solve across 8 virtual chips; per-shard PRNG folding
    gives different noise per shard."""
    from bez_isaacgym_tpu.parallel.mpc import data_parallel_mpc
    from bez_isaacgym_tpu.solvers.mppi import MPPIConfig, MPPISolver
    from bez_isaacgym_tpu.tasks.walk import WalkTask
    from bez_isaacgym_tpu.tasks.base import TaskConfig

    S = 8
    task = WalkTask(TaskConfig(substeps=1, episode_length_s=10.0,
                               use_pallas=False))
    solver = MPPISolver(task, MPPIConfig(horizon=2, num_samples=2))
    keys = jax.random.split(jax.random.PRNGKey(0), S)
    env_states = jax.device_put(jax.jit(jax.vmap(task.reset_one))(keys),
                                env_sharding(mesh))
    mppi = jax.device_put(
        jax.tree.map(lambda x: jnp.broadcast_to(x, (S,) + x.shape),
                     solver.init_state()), env_sharding(mesh))
    solve = data_parallel_mpc(solver, mesh)
    actions, mppi2, info = solve(env_states, mppi, jax.random.PRNGKey(1))
    actions = np.asarray(actions)
    assert actions.shape == (S, 18)
    assert np.isfinite(actions).all()
    # Different shards got different exploration noise.
    assert np.std(actions[:, 2:]) > 0.0


@pytest.mark.slow
def test_data_parallel_ppo_rnn_step(mesh):
    """Sharded recurrent PPO: the per-env LSTM carry is threaded through
    the shard_map wrapper (round-2 STATUS gap #6)."""
    from bez_isaacgym_tpu.parallel.dp import data_parallel_ppo
    from bez_isaacgym_tpu.rl.ppo import PPOConfig
    from bez_isaacgym_tpu.tasks.kick import KickTask
    from bez_isaacgym_tpu.tasks.base import TaskConfig

    num_envs = 16
    task = KickTask(TaskConfig(substeps=1, use_pallas=False))
    cfg = PPOConfig(horizon=2, seq_len=2, minibatch_size=num_envs,
                    mini_epochs=1, units=(16, 16), rnn_units=8)
    init_fn, train_iter, act_fn, initial_carry = data_parallel_ppo(
        task, num_envs, mesh, cfg)
    ts = jax.device_put(init_fn(jax.random.PRNGKey(0)), replicated(mesh))
    keys = jax.random.split(jax.random.PRNGKey(1), num_envs)
    env_state = jax.device_put(jax.jit(jax.vmap(task.reset_one))(keys),
                               env_sharding(mesh))
    obs = jax.device_put(jnp.zeros((num_envs, task.num_obs), jnp.float32),
                         env_sharding(mesh))
    carry = jax.device_put(initial_carry(), env_sharding(mesh))
    ts2, env_state, obs, carry, metrics = train_iter(
        ts, env_state, obs, carry)
    for v in metrics.values():
        assert np.isfinite(float(v))
    assert carry[0].shape == (num_envs, cfg.rnn_units)
