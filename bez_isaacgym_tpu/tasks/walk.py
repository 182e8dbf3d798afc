"""bez_walk: walk to a randomized goal in [-2,2]^2.

Pure-functional port of the reference WalkEnv
(/root/reference/bez_isaacgym/tasks/walk_env.py): obs 52 (walk_env.py:103-105),
goal resampling at reset (walk_env.py:570-574 — per-env here; the reference
shares one sample across all reset envs, a documented bug we fix), reward +
win-state kernel (walk_env.py:826-1030).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bez_isaacgym_tpu.ops import sensors
from bez_isaacgym_tpu.ops.quat import get_basis_vector
from bez_isaacgym_tpu.tasks.base import BezTask, EnvState, TaskConfig


def walk_config() -> TaskConfig:
    # bez_walk.yaml: episode 10 s, goal default (2,0).
    return TaskConfig(episode_length_s=10.0, goal=(2.0, 0.0))


class WalkTask(BezTask):

    num_obs = 52
    has_ball = False

    def __init__(self, cfg: TaskConfig | None = None):
        super().__init__(cfg or walk_config())

    def task_reset(self, state: EnvState, key) -> EnvState:
        cfg = self.cfg
        if cfg.goal_range_min > 0.0:
            k_r, k_th = jax.random.split(key)
            r = jax.random.uniform(k_r, (), jnp.float32,
                                   cfg.goal_range_min, cfg.goal_range)
            th = jax.random.uniform(k_th, (), jnp.float32,
                                    -jnp.pi, jnp.pi)
            goal = r * jnp.stack([jnp.cos(th), jnp.sin(th)])
        else:
            goal = jax.random.uniform(key, (2,), jnp.float32,
                                      -cfg.goal_range, cfg.goal_range)
        return state._replace(goal=goal)

    def observe(self, state: EnvState, action):
        ph = state.physics
        imu, new_prev = self._imu_and_heading(state)
        off_orn = sensors.compute_off_orn(ph.base_pos, ph.base_quat, state.goal)
        feet = self._feet(state)
        obs = jnp.concatenate([ph.q, ph.qd, imu, off_orn, feet])
        return obs, state._replace(prev_lin_vel=new_prev)

    def reward_done(self, state: EnvState, action):
        """walk reward (walk_env.py:826-1030), "Variant Walking" branch."""
        cfg = self.cfg
        ph = state.physics
        f32 = ph.q.dtype
        bez_xy = ph.base_pos[0:2]
        v_imu = ph.base_u[0:3]
        w_imu = ph.base_u[3:6]

        to_goal = state.goal - bez_xy
        to_goal_norm = jnp.linalg.norm(to_goal)
        unit = to_goal / to_goal_norm.clip(1e-9)
        velocity_forward = jnp.dot(unit, v_imu[0:2])

        up = get_basis_vector(ph.base_quat, jnp.array([0.0, 0.0, 1.0], f32))
        up_proj = up[2]

        vel_reward = jnp.linalg.norm(jnp.concatenate([v_imu, w_imu]))
        vel_lin = jnp.linalg.norm(v_imu)
        vel_ang = jnp.linalg.norm(w_imu)
        pos_reward = jnp.linalg.norm(self.default_dof_pos - ph.q)
        distance_to_height = jnp.abs(1.0 - up_proj)  # DESIRED_HEIGHT=1 on up_proj

        # Near goal: hold still (walk_env.py:905-908,931-933).
        height_vel_pos = -(0.05 * vel_reward + 0.05 * pos_reward
                           + distance_to_height)
        # Far: goal-directed velocity x10 (walk_env.py:917-921).
        vel_height = (10.0 * velocity_forward
                      - (distance_to_height + 0.25 * pos_reward))
        reward = jnp.where(to_goal_norm < 0.05, height_vel_pos, vel_height)
        if cfg.win_shaping:
            # TRAINING-ONLY shaping toward the win predicate (see
            # TaskConfig.win_shaping): proximity kernel sized to the 5 cm
            # win radius, doubled when the robot is also still and near
            # the default pose (the other three win conditions) — W2
            # measured policies loitering at 8-9 cm without ever closing,
            # so the kernel must keep a gradient INSIDE 10 cm.  The whole
            # bonus is gated on uprightness: the round-4 LSTM stage
            # reached 3.5 cm by DIVING onto the goal (fall 70%) because
            # proximity paid regardless of posture.
            upright = jnp.clip((up_proj - 0.7) / 0.25, 0.0, 1.0)
            prox = jnp.exp(-(to_goal_norm / 0.08) ** 2)
            # Wide stillness kernels: the measured closest-approach state
            # is mid-gait (pos_err ~2.3 rad, spin ~1.9 rad/s), so kernels
            # at the win thresholds (0.15/0.1) are flat-zero there — these
            # scales keep a usable gradient from the gait toward the
            # freeze-in-ready-pose the win demands.
            still = jnp.exp(-(vel_lin / 0.3) ** 2 - (vel_ang / 1.0) ** 2
                            - (pos_reward / 1.0) ** 2)
            reward = reward + cfg.win_shaping * upright * prox * \
                (0.5 + 2.0 * still)

        done = state.done & False
        # Fall (walk_env.py:938-939).
        fell = up_proj < 0.7
        reward = jnp.where(fell, -100.0, reward)
        done = done | fell
        # Win state: 4 conditions (walk_env.py:943-965).
        wins = (jnp.asarray(to_goal_norm < 0.05, f32)
                + jnp.asarray(pos_reward < 0.15, f32)
                + jnp.asarray(vel_ang < 0.1, f32)
                + jnp.asarray(vel_lin < 0.1, f32))
        won = wins == 4.0
        reward = jnp.where(
            won,
            1000.0 - 1000.0 * state.progress.astype(f32) / cfg.max_episode_length,
            reward)
        done = done | won
        # Heading deviated > pi/2 from the start->goal bearing
        # (walk_env.py:966-990; the reference zeroes bez_init in-place).
        init_to_goal = state.goal  # bez_init treated as the origin
        init_angle = jnp.arctan2(init_to_goal[1], init_to_goal[0])
        cur_angle = jnp.arctan2(unit[1], unit[0])
        angle_diff = jnp.abs(init_angle - cur_angle)
        strayed = angle_diff > 1.5708
        reward = jnp.where(strayed, -100.0, reward)
        done = done | strayed
        # Horizon (walk_env.py:994-997).
        horizon = state.progress >= cfg.max_episode_length
        reward = jnp.where(horizon, 0.0, reward)
        done = done | horizon
        return reward, done
