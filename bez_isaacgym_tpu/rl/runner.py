"""Training runner: wires config -> task -> PPO -> checkpoints/metrics.

Replaces the reference Runner stack (train.py:60-113, utils/torch_runner.py):
build the task, init or restore the train state, loop train_iter with
periodic checkpointing (save_frequency/save_best_after,
bez_kickPPO.yaml:65-66) and metric logging.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from bez_isaacgym_tpu.rl.ppo import make_ppo
from bez_isaacgym_tpu.tasks.registry import make_task
from bez_isaacgym_tpu.utils import checkpoint as ckpt
from bez_isaacgym_tpu.utils.config import RunConfig, pretty
from bez_isaacgym_tpu.utils.metrics import MetricsLogger


class Runner:

    def __init__(self, cfg: RunConfig):
        self.cfg = cfg
        self.task = make_task(cfg.task, cfg.resolved_task_cfg())
        self.run_dir = os.path.join(cfg.output_dir, cfg.name)

        self.recurrent = cfg.train.rnn_units > 0
        if self.recurrent and cfg.multi_chip and len(jax.devices()) > 1:
            from bez_isaacgym_tpu.parallel.dp import data_parallel_ppo
            from bez_isaacgym_tpu.parallel.mesh import env_mesh
            self.mesh = env_mesh()
            (self.init_fn, self.train_iter, self.act_fn,
             self.initial_carry) = data_parallel_ppo(
                self.task, cfg.num_envs, self.mesh, cfg.train)
        elif self.recurrent:
            # LSTM policy (bez_kickPPO.yaml:34-40 option), single chip.
            from bez_isaacgym_tpu.rl.ppo_rnn import make_ppo_rnn
            self.mesh = None
            init_fn, train_iter, self.act_fn, self.initial_carry = \
                make_ppo_rnn(self.task, cfg.num_envs, cfg.train)
            self.init_fn, self.train_iter = init_fn, jax.jit(train_iter)
        elif cfg.multi_chip and len(jax.devices()) > 1:
            from bez_isaacgym_tpu.parallel.dp import data_parallel_ppo
            from bez_isaacgym_tpu.parallel.mesh import env_mesh
            self.mesh = env_mesh()
            self.init_fn, self.train_iter, self.act_fn = data_parallel_ppo(
                self.task, cfg.num_envs, self.mesh, cfg.train)
        else:
            self.mesh = None
            init_fn, train_iter, self.act_fn = make_ppo(
                self.task, cfg.num_envs, cfg.train)
            self.init_fn, self.train_iter = init_fn, jax.jit(train_iter)

    def _init_states(self):
        cfg = self.cfg
        ts = self.init_fn(jax.random.PRNGKey(cfg.seed))
        keys = jax.random.split(jax.random.PRNGKey(cfg.seed + 1), cfg.num_envs)
        env_state = jax.jit(jax.vmap(self.task.reset_one))(keys)
        # Initial obs from the freshly reset envs (the reference's reset()
        # performs a zero-action step+observe; observing the reset state
        # keeps progress=0 while giving the first rollout a real obs).
        zero_act = jnp.zeros(self.task.num_actions, jnp.float32)
        obs, env_state = jax.jit(jax.vmap(
            lambda s: self.task.observe(s, zero_act)))(env_state)
        if self.mesh is not None:
            from bez_isaacgym_tpu.parallel.mesh import env_sharding, replicated
            ts = jax.device_put(ts, replicated(self.mesh))
            env_state = jax.device_put(env_state, env_sharding(self.mesh))
            obs = jax.device_put(obs, env_sharding(self.mesh))
        if cfg.checkpoint:
            ts = ckpt.restore(cfg.checkpoint, ts)
            print(f"restored checkpoint {cfg.checkpoint}")
        return ts, env_state, obs

    def train(self, max_iterations: int | None = None):
        cfg = self.cfg
        print(pretty(cfg))
        logger = MetricsLogger(self.run_dir)
        ts, env_state, obs = self._init_states()

        frames_per_iter = cfg.num_envs * cfg.train.horizon
        best_reward = -np.inf
        ep_reward_ema = None   # smoothed completed-episode return
        iters = max_iterations or cfg.max_iterations
        carry = self.initial_carry() if self.recurrent else None
        if self.recurrent and self.mesh is not None:
            from bez_isaacgym_tpu.parallel.mesh import env_sharding
            carry = jax.device_put(carry, env_sharding(self.mesh))
        for it in range(1, iters + 1):
            if self.recurrent:
                ts, env_state, obs, carry, metrics = self.train_iter(
                    ts, env_state, obs, carry)
            else:
                ts, env_state, obs, metrics = self.train_iter(
                    ts, env_state, obs)
            # Smooth the episode return (episodes complete sparsely within a
            # 32-step horizon); this is the score the reference logs/ranks
            # checkpoints by (rlgames_utils.py:145-151, mean scores).
            if float(metrics.get("ep_count", 0.0)) > 0:
                er = float(metrics["ep_reward_mean"])
                ep_reward_ema = er if ep_reward_ema is None else \
                    0.9 * ep_reward_ema + 0.1 * er
            score = ep_reward_ema if ep_reward_ema is not None else \
                float(metrics["reward_mean"])
            if it % cfg.log_frequency == 0 or it == 1:
                m = {k: float(v) for k, v in metrics.items()}
                m["ep_reward_ema"] = score
                logger.log(it, it * frames_per_iter, m)
                print(f"iter {it}: ep_reward {score:.2f} "
                      f"reward/step {m['reward_mean']:.4f} "
                      f"kl {m['kl']:.4f} lr {m['lr']:.2e} "
                      f"done% {100 * m['done_frac']:.1f} "
                      f"ep_len {m['ep_len_mean']:.0f}")
            if it % cfg.save_frequency == 0:
                path = os.path.join(
                    self.run_dir, ckpt.checkpoint_name(cfg.name, it, score))
                ckpt.save(path, ts)
            if it > cfg.save_best_after and score > best_reward:
                best_reward = score
                # Single overwritten best file (the reference re-saves
                # "<name>_<epoch>.pth on new best"; one file avoids spam).
                ckpt.save(os.path.join(self.run_dir, f"{cfg.name}_best.ckpt"),
                          ts)
        logger.close()
        return ts

    def play(self, num_steps: int | None = None, deterministic: bool = True):
        """Checkpoint inference loop (play.py:125-236 parity)."""
        cfg = self.cfg
        num_steps = num_steps or cfg.play_steps
        ts, env_state, obs = self._init_states()
        step = jax.jit(self.task.step_batch)
        if self.recurrent:
            act = jax.jit(lambda ts, o, c: self.act_fn(
                ts, o, c, deterministic=deterministic))
            carry = self.initial_carry()
        else:
            act = jax.jit(lambda ts, o: self.act_fn(
                ts, o, deterministic=deterministic))
        total_reward = np.zeros(cfg.num_envs)
        episodes = 0
        ep_reward_sum = 0.0
        last_r0 = 0.0   # env-0 step reward for the live reward strip
        # render="live" streams an MJPEG viewer with keyboard control
        # (reference interactive viewer parity, vec_task.py:186-224);
        # any other value records frames for a GIF/MP4.
        live = None
        frames = None
        if cfg.render == "live":
            from bez_isaacgym_tpu.viz.live import LiveViewer
            live = LiveViewer()
        elif cfg.render:
            frames = []
        t = 0
        for _ in range(num_steps):
            if live is not None:
                if live.quit_requested:   # ESC (vec_task.py:200,386-387)
                    break
                live.wait_if_paused()
                if live.pop_reset():
                    keys = jax.random.split(
                        jax.random.PRNGKey(int(time.time())), cfg.num_envs)
                    env_state = jax.jit(jax.vmap(self.task.reset_one))(keys)
                    zero = jnp.zeros(self.task.num_actions, jnp.float32)
                    obs, env_state = jax.jit(jax.vmap(
                        lambda s: self.task.observe(s, zero)))(env_state)
                live.publish(self.task.model,
                             jax.tree.map(lambda x: np.asarray(x[0]),
                                          env_state.physics),
                             extra_title=f"t = {t / 60:.2f} s",
                             reward=last_r0)
                t += 1
            if frames is not None:
                frames.append(jax.tree.map(lambda x: np.asarray(x[0]),
                                           env_state.physics))
            if self.recurrent:
                actions, carry = act(ts, obs, carry)
            else:
                actions = act(ts, obs)
            out = step(env_state, actions)
            if self.recurrent:
                # RNN-state reset on done (play.py:196-199).
                d = np.asarray(out.done)[:, None]
                carry = jax.tree.map(
                    lambda c: jnp.where(jnp.asarray(d), 0.0, c), carry)
            env_state, obs = out.state, out.obs
            r = np.asarray(out.reward)
            d = np.asarray(out.done)
            last_r0 = float(r[0])
            total_reward += r
            ep_reward_sum += float(total_reward[d].sum())
            episodes += int(d.sum())
            total_reward[d] = 0.0
        mean_ep = ep_reward_sum / max(1, episodes)
        print(f"played {num_steps} steps, {episodes} episodes, "
              f"mean episode reward {mean_ep:.2f}")
        if live is not None:
            live.close()
        if frames is not None:
            from bez_isaacgym_tpu.viz.render import render_episode
            render_episode(self.task.model, frames, cfg.render)
            print(f"wrote episode render to {cfg.render}")
        return mean_ep
