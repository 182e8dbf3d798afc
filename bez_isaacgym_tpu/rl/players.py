"""Policy players: checkpoint inference (reference parity: utils/players.py,
utils/player.py).

`PpoPlayerContinuous` mirrors the reference player's surface: build the
network from the train config, `restore()` a checkpoint (weights + running
mean/std), `get_action(obs, deterministic)` returning env-scaled actions
(mu when deterministic, players.py:41-66), and a batched eval `run()` loop
with episode accounting (player.py:155-257).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bez_isaacgym_tpu.rl.ppo import PPOConfig, make_ppo
from bez_isaacgym_tpu.tasks.base import BezTask
from bez_isaacgym_tpu.utils import checkpoint as ckpt


class PpoPlayerContinuous:

    def __init__(self, task: BezTask, cfg: PPOConfig = PPOConfig(),
                 checkpoint_path: str = "", seed: int = 0):
        self.task = task
        self.cfg = cfg
        init_fn, _, act_fn = make_ppo(task, num_envs=1, cfg=cfg)
        self.train_state = init_fn(jax.random.PRNGKey(seed))
        self._act = jax.jit(
            lambda ts, obs, key, det: act_fn(ts, obs, key=key,
                                             deterministic=det),
            static_argnums=3)
        if checkpoint_path:
            self.restore(checkpoint_path)

    def restore(self, path: str) -> None:
        """Load model weights + running normalization (players.py:68-72)."""
        self.train_state = ckpt.restore(path, self.train_state)

    def get_action(self, obs, deterministic: bool = True,
                   key=None) -> jnp.ndarray:
        key = key if key is not None else jax.random.PRNGKey(0)
        return self._act(self.train_state, jnp.asarray(obs, jnp.float32),
                         key, deterministic)

    def run(self, env, num_steps: int = 600, deterministic: bool = True,
            key=None):
        """Batched eval loop with per-episode reward/length accounting."""
        key = key if key is not None else jax.random.PRNGKey(0)
        obs = env.reset()
        returns = np.zeros(env.num_envs)
        lengths = np.zeros(env.num_envs, dtype=int)
        done_returns, done_lengths = [], []
        for _ in range(num_steps):
            key, sub = jax.random.split(key)
            actions = self.get_action(obs, deterministic, sub)
            obs, reward, done, _ = env.step(actions)
            returns += np.asarray(reward)
            lengths += 1
            d = np.asarray(done)
            if d.any():
                done_returns.extend(returns[d].tolist())
                done_lengths.extend(lengths[d].tolist())
                returns[d] = 0.0
                lengths[d] = 0
        games = max(1, len(done_returns))
        return {
            "episodes": len(done_returns),
            "mean_reward": float(np.sum(done_returns)) / games,
            "mean_length": float(np.sum(done_lengths)) / games,
        }
