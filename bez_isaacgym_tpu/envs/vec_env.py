"""VecEnv: batched, jitted environment wrapper over a pure task.

The user-facing analog of the reference's `VecTask` + `RLGPUEnv` pair
(/root/reference/bez_isaacgym/tasks/base/vec_task.py:303-377,
 utils/rlgames_utils.py:157-181): `step(actions) -> (obs, reward, done,
info)` over `num_envs` environments, with auto-reset.  Internally everything
is `jax.vmap`-ed over the env axis and `jax.jit`-ed into one XLA program per
step; the env axis can be sharded over a device mesh (see
bez_isaacgym_tpu.parallel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bez_isaacgym_tpu.tasks.base import BezTask, StepOutput
from bez_isaacgym_tpu.utils.spaces import Box


class VecEnv:

    def __init__(self, task: BezTask, num_envs: int, seed: int = 0,
                 sharding=None):
        self.task = task
        self.num_envs = num_envs
        self.num_obs = task.num_obs
        self.num_actions = task.num_actions

        self.observation_space = Box.symmetric(np.inf, task.num_obs)
        # Box(-1, 1) like the reference act_space (vec_task.py:95); the
        # env-side clip_actions clamp is applied inside the task step.
        self.action_space = Box.symmetric(1.0, task.num_actions)

        self._sharding = sharding
        self._reset_fn = jax.jit(jax.vmap(task.reset_one))
        self._step_fn = jax.jit(task.step_batch)
        self._key = jax.random.PRNGKey(seed)
        self.state = None

    def _device_put(self, tree):
        if self._sharding is not None:
            return jax.device_put(tree, self._sharding)
        return tree

    def reset(self) -> jnp.ndarray:
        """Fresh episode for every env; returns initial obs (obtained by one
        zero-action step, mirroring vec_task.py:361-377)."""
        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, self.num_envs)
        self.state = self._device_put(self._reset_fn(keys))
        zeros = jnp.zeros((self.num_envs, self.num_actions), jnp.float32)
        out: StepOutput = self._step_fn(self.state, zeros)
        # Keep the stepped state so the obs we return is the obs the next
        # step() continues from (vec_task.py:361-377 keeps the stepped state).
        self.state = out.state
        return out.obs

    def step(self, actions):
        """-> (obs, reward, done, info) with info['time_outs'] parity
        (vec_task.py:331-341)."""
        if self.state is None:
            self.reset()
        actions = jnp.asarray(actions, jnp.float32)
        out: StepOutput = self._step_fn(self.state, actions)
        self.state = out.state
        info = {"time_outs": out.time_out}
        return out.obs, out.reward, out.done, info
