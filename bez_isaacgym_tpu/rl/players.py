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


class PpoPlayerDiscrete:
    """Discrete/multi-discrete policy player (players.py:77-175 parity).

    The reference's version is generic rl-games surface (none of the Bez
    tasks are discrete; its own `get_masked_action` even references an
    undefined `res_dict` — players.py:110-122).  This is the working
    equivalent: a categorical-logits network with argmax (deterministic) or
    sampled actions, optional action masks, and checkpoint restore with
    running normalization.
    """

    def __init__(self, num_obs: int, actions_num, units=(256, 128),
                 normalize_input: bool = True, seed: int = 0):
        import flax.linen as nn

        self.multi = isinstance(actions_num, (tuple, list))
        self.actions_num = actions_num
        self.normalize_input = normalize_input
        dims = list(actions_num) if self.multi else [actions_num]

        class Net(nn.Module):
            @nn.compact
            def __call__(self, x):
                for u in units:
                    x = nn.elu(nn.Dense(u)(x))
                return [nn.Dense(d)(x) for d in dims]

        self._net = Net()
        self.params = self._net.init(jax.random.PRNGKey(seed),
                                     jnp.zeros((1, num_obs)))
        from bez_isaacgym_tpu.rl.networks import RunningMeanStd
        self.obs_rms = RunningMeanStd.create((num_obs,))

        def act(params, obs_rms, obs, key, deterministic, masks):
            x = obs_rms.normalize(obs) if normalize_input else obs
            logits = self._net.apply(params, x)
            outs = []
            for i, lg in enumerate(logits):
                if masks is not None:
                    lg = jnp.where(masks[i], lg, -1e9)
                if deterministic:
                    outs.append(jnp.argmax(lg, axis=-1))
                else:
                    key, sub = jax.random.split(key)
                    outs.append(jax.random.categorical(sub, lg, axis=-1))
            a = jnp.stack(outs, axis=-1)
            return a[..., 0] if not self.multi else a

        self._act = jax.jit(act, static_argnums=(4,))

    def get_action(self, obs, deterministic: bool = True, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        return self._act(self.params, self.obs_rms,
                         jnp.asarray(obs, jnp.float32), key, deterministic,
                         None)

    def get_masked_action(self, obs, action_masks, deterministic: bool = True,
                          key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        masks = [jnp.asarray(m, bool) for m in action_masks] \
            if self.multi else [jnp.asarray(action_masks, bool)]
        return self._act(self.params, self.obs_rms,
                         jnp.asarray(obs, jnp.float32), key, deterministic,
                         masks)

    def restore(self, path: str) -> None:
        state = {"params": self.params, "obs_rms": self.obs_rms}
        state = ckpt.restore(path, state)
        self.params, self.obs_rms = state["params"], state["obs_rms"]


class SACPlayer:
    """SAC policy player (players.py:178-218 parity): tanh-gaussian actor,
    mean action when deterministic, actions clamped to the action range;
    restore() loads actor/critic/critic_target like the reference's
    checkpoint layout."""

    def __init__(self, task: BezTask, units=(256, 256), seed: int = 0,
                 checkpoint_path: str = ""):
        import flax.linen as nn

        self.task = task
        self.action_range = (-1.0, 1.0)   # act_space Box(-1,1), vec_task:95
        na, no = task.num_actions, task.num_obs

        class Actor(nn.Module):
            @nn.compact
            def __call__(self, x):
                for u in units:
                    x = nn.relu(nn.Dense(u)(x))
                mu = nn.Dense(na)(x)
                log_std = nn.Dense(na)(x)
                return mu, jnp.clip(log_std, -5.0, 2.0)

        class Critic(nn.Module):
            @nn.compact
            def __call__(self, x, a):
                x = jnp.concatenate([x, a], axis=-1)
                for u in units:
                    x = nn.relu(nn.Dense(u)(x))
                return nn.Dense(1)(x)[..., 0]

        self._actor = Actor()
        self._critic = Critic()
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        zo = jnp.zeros((1, no))
        za = jnp.zeros((1, na))
        self.actor_params = self._actor.init(k1, zo)
        self.critic_params = self._critic.init(k2, zo, za)
        self.critic_target_params = jax.tree.map(jnp.copy, self.critic_params)

        def act(params, obs, key, sample):
            mu, log_std = self._actor.apply(params, obs)
            a = mu if not sample else \
                mu + jnp.exp(log_std) * jax.random.normal(key, mu.shape)
            return jnp.clip(jnp.tanh(a), *self.action_range)

        self._act = jax.jit(act, static_argnums=3)
        if checkpoint_path:
            self.restore(checkpoint_path)

    def get_action(self, obs, sample: bool = False, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        return self._act(self.actor_params, jnp.asarray(obs, jnp.float32),
                         key, sample)

    def restore(self, path: str) -> None:
        state = {"actor": self.actor_params, "critic": self.critic_params,
                 "critic_target": self.critic_target_params}
        state = ckpt.restore(path, state)
        self.actor_params = state["actor"]
        self.critic_params = state["critic"]
        self.critic_target_params = state["critic_target"]
