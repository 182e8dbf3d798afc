"""MPPI (model-predictive path integral) sampling solver.

The sampling stage of the north-star MPC engine (BASELINE.json): K perturbed
action sequences per solve are rolled out through the batched physics step
over an H-step horizon with `lax.scan`, scored with the task's reward, and
softmax-averaged.  All S parallel solves x K samples run as ONE flattened
physics batch of S*K rollouts — the layout that saturates the chip (see
ops.engine perf notes); shard the solve axis over the device mesh for
multi-chip scaling.

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
    num_samples: int = 32      # K rollouts per solve
    sigma: float = 0.15        # exploration std [rad]; tuned round 2
                               # (0.15/0.05 kicks 58/64 closed-loop vs
                               # 55/64 at the round-1 0.25 default, with
                               # +19% ball progress —
                               # runs/Bez_Kick/mpc_kick_eval.json)
    temperature: float = 0.05  # softmax temperature (lambda)
    gamma: float = 1.0         # reward discount along the horizon
    done_penalty: float = 10.0 # extra cost when a rollout terminates


class MPPIState(NamedTuple):
    """Per-solve solver state: the warm-started nominal sequence."""

    nominal: jnp.ndarray       # (H, nq) action sequence


class MPPISolver:
    """Batched MPC: solve(env_states, mppi_states, keys) over S solves."""

    def __init__(self, task: BezTask, cfg: MPPIConfig = MPPIConfig()):
        self.task = task
        self.cfg = cfg

    def init_state(self) -> MPPIState:
        return MPPIState(nominal=jnp.zeros(
            (self.cfg.horizon, self.task.num_actions), F32))

    def _rollout_scores(self, env_states: EnvState, seqs: jnp.ndarray):
        """Total discounted rewards (N,) for N flattened rollouts.

        env_states: batched EnvState with leading dim N; seqs (N, H, nq).
        """
        task, cfg = self.task, self.cfg
        na = task.num_actions

        def body(carry, u_t):
            physics, progress, alive = carry           # batched (N, ...)
            u = jnp.clip(u_t, -task.cfg.clip_actions, task.cfg.clip_actions)
            u = u.at[:, 0:2].set(0.0)
            targets = jnp.clip(u + task.default_dof_pos[None],
                               task.dof_lower[None], task.dof_upper[None])
            physics = task._step_physics_batch(env_states.dyn, physics, targets)
            progress = progress + 1
            s = env_states._replace(physics=physics, progress=progress)
            reward, done = jax.vmap(task.reward_done)(s, u)
            reward = jnp.where(alive, reward, 0.0)
            terminal = alive & done & (progress < task.cfg.max_episode_length)
            reward = reward - cfg.done_penalty * terminal.astype(F32)
            alive = alive & ~done
            return (physics, progress, alive), reward

        init = (env_states.physics, env_states.progress,
                jnp.ones(seqs.shape[0], bool))
        _, rewards = jax.lax.scan(body, init, jnp.swapaxes(seqs, 0, 1))
        disc = cfg.gamma ** jnp.arange(cfg.horizon, dtype=F32)
        return jnp.einsum("hn,h->n", rewards, disc)

    def solve(self, env_states: EnvState, mppi_states: MPPIState, key):
        """One MPC solve for S envs at once.

        env_states: batched EnvState (leading dim S); mppi_states.nominal
        (S, H, nq); key single PRNG key.  Returns (actions (S,nq),
        mppi_states', info).
        """
        cfg = self.cfg
        S, H, na = mppi_states.nominal.shape
        K = cfg.num_samples
        eps = cfg.sigma * jax.random.normal(key, (S, K, H, na), F32)
        seqs = mppi_states.nominal[:, None] + eps        # (S,K,H,na)

        flat_states = jax.tree.map(
            lambda x: jnp.repeat(x, K, axis=0), env_states)
        scores = self._rollout_scores(
            flat_states, seqs.reshape(S * K, H, na)).reshape(S, K)

        w = jax.nn.softmax(scores / cfg.temperature, axis=-1)   # (S,K)
        new_nominal = jnp.einsum("sk,skhj->shj", w, seqs)
        actions = new_nominal[:, 0]
        shifted = jnp.concatenate([new_nominal[:, 1:], new_nominal[:, -1:]],
                                  axis=1)
        info = {"best_score": scores.max(-1), "mean_score": scores.mean(-1),
                "ess": 1.0 / jnp.sum(w * w, -1)}
        return actions, MPPIState(nominal=shifted), info
