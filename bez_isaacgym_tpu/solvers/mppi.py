"""MPPI (model-predictive path integral) sampling solver.

The sampling stage of the north-star MPC engine (BASELINE.json): K perturbed
action sequences are rolled out through the differentiable physics step over
an H-step horizon with `lax.scan`, scored with the task's reward, and
softmax-averaged.  Everything is one jitted program; batch over parallel
solves with `jax.vmap` and shard the solve axis over the device mesh.

The rollout reuses the same physics step the env uses, so MPC plans are
consistent with env dynamics by construction (the reference has no MPC; its
closest analog is the classical walking engine driving env.step at
/root/reference/resources/library/pycontrol/.../soccerbot_controller.py:27-45).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bez_isaacgym_tpu.tasks.base import BezTask, EnvState

F32 = jnp.float32


@dataclass(frozen=True)
class MPPIConfig:
    horizon: int = 32          # BASELINE.md: 32-step horizon target
    num_samples: int = 64      # K rollouts per solve
    sigma: float = 0.25        # exploration std [rad]
    temperature: float = 0.05  # softmax temperature (lambda)
    gamma: float = 1.0         # reward discount along the horizon
    done_penalty: float = 10.0 # extra cost when a rollout terminates


class MPPIState(NamedTuple):
    """Per-env solver state: the warm-started nominal sequence."""

    nominal: jnp.ndarray       # (H, nq) action sequence


class MPPISolver:
    """solve(env_state, mppi_state, key) -> (action, mppi_state', info)."""

    def __init__(self, task: BezTask, cfg: MPPIConfig = MPPIConfig()):
        self.task = task
        self.cfg = cfg

    def init_state(self) -> MPPIState:
        return MPPIState(nominal=jnp.zeros(
            (self.cfg.horizon, self.task.num_actions), F32))

    def _rollout_score(self, env_state: EnvState, seq: jnp.ndarray) -> jnp.ndarray:
        """Total discounted reward of one action sequence (H, nq)."""
        task, cfg = self.task, self.cfg

        def body(carry, u):
            physics, progress, alive = carry
            u = jnp.clip(u, -task.cfg.clip_actions, task.cfg.clip_actions)
            u = u.at[0:2].set(0.0)
            targets = jnp.clip(u + task.default_dof_pos,
                               task.dof_lower, task.dof_upper)
            physics = task._step_physics(env_state.dyn, physics, targets)
            progress = progress + 1
            s = env_state._replace(physics=physics, progress=progress)
            reward, done = task.reward_done(s, u)
            reward = jnp.where(alive, reward, 0.0)
            reward = reward - cfg.done_penalty * jnp.where(
                alive & done & (progress < task.cfg.max_episode_length), 1.0, 0.0)
            alive = alive & ~done
            return (physics, progress, alive), reward

        init = (env_state.physics, env_state.progress,
                jnp.ones((), bool))
        _, rewards = jax.lax.scan(body, init, seq)
        disc = cfg.gamma ** jnp.arange(cfg.horizon, dtype=F32)
        return jnp.sum(rewards * disc)

    def solve(self, env_state: EnvState, mppi_state: MPPIState, key):
        """One MPC solve for a single env (vmap for batches)."""
        cfg = self.cfg
        eps = cfg.sigma * jax.random.normal(
            key, (cfg.num_samples, cfg.horizon, self.task.num_actions), F32)
        seqs = mppi_state.nominal[None] + eps
        scores = jax.vmap(lambda s: self._rollout_score(env_state, s))(seqs)
        w = jax.nn.softmax(scores / cfg.temperature)
        new_nominal = jnp.einsum("k,khj->hj", w, seqs)
        action = new_nominal[0]
        # Receding horizon: shift left, repeat the last action.
        shifted = jnp.concatenate([new_nominal[1:], new_nominal[-1:]], axis=0)
        info = {"best_score": scores.max(), "mean_score": scores.mean(),
                "ess": 1.0 / jnp.sum(w * w)}
        return action, MPPIState(nominal=shifted), info
