"""Data-parallel PPO training over a device mesh via shard_map.

Each shard steps its slice of the env batch and computes local gradients;
psum over the "env" mesh axis (riding ICI) reduces gradients and KL metrics
— the TPU-native analog of rl-games' Horovod allreduce
(/root/reference/bez_isaacgym/utils/rlgames_utils.py:71-81).
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from bez_isaacgym_tpu.parallel.mesh import ENV_AXIS
from bez_isaacgym_tpu.rl.ppo import PPOConfig, make_ppo
from bez_isaacgym_tpu.tasks.base import BezTask


def data_parallel_ppo(task: BezTask, num_envs: int, mesh,
                      cfg: PPOConfig = PPOConfig()):
    """Returns (init_fn, train_iter, act_fn) with the env axis sharded over
    `mesh` and gradients psum-reduced per minibatch.

    num_envs is the *global* env count; it must divide by the mesh size.
    The per-shard minibatch is scaled so the global effective minibatch
    matches cfg.minibatch_size.
    """
    n_shards = mesh.devices.size
    assert num_envs % n_shards == 0, (num_envs, n_shards)
    local_cfg = PPOConfig(**{
        **cfg.__dict__,
        "minibatch_size": max(1, cfg.minibatch_size // n_shards),
    })
    recurrent = cfg.rnn_units > 0
    if recurrent:
        from bez_isaacgym_tpu.rl.ppo_rnn import make_ppo_rnn
        init_fn, train_iter, act_fn, initial_carry = make_ppo_rnn(
            task, num_envs // n_shards, local_cfg, axis_name=ENV_AXIS)
    else:
        init_fn, train_iter, act_fn = make_ppo(task, num_envs // n_shards,
                                               local_cfg, axis_name=ENV_AXIS)

    ts_spec = P()          # replicated train state
    env_spec = P(ENV_AXIS)  # sharded env batch (and per-env LSTM carry)

    def _fold_key(ts):
        # Fold the shard index into the key so every shard draws distinct
        # exploration noise / minibatch permutations, then advance the
        # *replicated* key identically on all shards so the train state
        # stays bit-replicated (required by the P() out_spec).
        return ts._replace(
            key=jax.random.fold_in(ts.key, jax.lax.axis_index(ENV_AXIS)))

    if recurrent:
        def shard_iter(ts, env_state, obs, carry):
            base_key = ts.key
            ts2, env_state, obs, carry, metrics = train_iter(
                _fold_key(ts), env_state, obs, carry)
            ts2 = ts2._replace(key=jax.random.split(base_key)[0])
            metrics = {k: jax.lax.pmean(v, ENV_AXIS)
                       for k, v in metrics.items()}
            return ts2, env_state, obs, carry, metrics

        sharded_train = shard_map(
            shard_iter, mesh=mesh,
            in_specs=(ts_spec, env_spec, env_spec, env_spec),
            out_specs=(ts_spec, env_spec, env_spec, env_spec, ts_spec),
            check_rep=False,
        )
        return init_fn, jax.jit(sharded_train), act_fn, \
            lambda: initial_carry(num_envs)

    def shard_iter(ts, env_state, obs):
        base_key = ts.key
        ts2, env_state, obs, metrics = train_iter(_fold_key(ts),
                                                  env_state, obs)
        ts2 = ts2._replace(key=jax.random.split(base_key)[0])
        metrics = {k: jax.lax.pmean(v, ENV_AXIS) for k, v in metrics.items()}
        return ts2, env_state, obs, metrics

    sharded_train = shard_map(
        shard_iter, mesh=mesh,
        in_specs=(ts_spec, env_spec, env_spec),
        out_specs=(ts_spec, env_spec, env_spec, ts_spec),
        check_rep=False,
    )

    return init_fn, jax.jit(sharded_train), act_fn
