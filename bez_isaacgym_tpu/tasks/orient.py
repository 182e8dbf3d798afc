"""bez_orient: turn in place to a goal yaw angle.

Pure-functional port of the reference OrientEnv
(/root/reference/bez_isaacgym/tasks/orient_env.py): obs 52 with the
(cos, sin) off-angle feature (orient_env.py:719-733), reward kernel
(orient_env.py:843-1046).  Note the reference's velocity term is dead code —
it is overwritten by the -0.5*|angle error| term (orient_env.py:920-921);
we implement the effective behavior.
"""

from __future__ import annotations

import jax.numpy as jnp

from bez_isaacgym_tpu.ops.quat import get_basis_vector, get_euler_xyz, normalize_angle
from bez_isaacgym_tpu.tasks.base import BezTask, EnvState, TaskConfig


def orient_config() -> TaskConfig:
    # bez_orient.yaml: episode 10 s, goal_angle pi/2.
    return TaskConfig(episode_length_s=10.0, goal=(2.0, 0.0),
                      goal_angle=1.5708)


def compute_off_angle(base_quat: jnp.ndarray, goal_angle: jnp.ndarray):
    """(2,) = (cos, sin) of goal_angle - yaw (orient_env.py:719-733)."""
    _, _, yaw = get_euler_xyz(base_quat)
    diff = goal_angle - normalize_angle(yaw)
    return jnp.stack([jnp.cos(diff), jnp.sin(diff)]), diff


class OrientTask(BezTask):

    num_obs = 52
    has_ball = False

    def __init__(self, cfg: TaskConfig | None = None):
        super().__init__(cfg or orient_config())

    def observe(self, state: EnvState, action):
        ph = state.physics
        imu, new_prev = self._imu_and_heading(state)
        off_angle, _ = compute_off_angle(ph.base_quat, state.goal_angle)
        feet = self._feet(state)
        obs = jnp.concatenate([ph.q, ph.qd, imu, off_angle, feet])
        return obs, state._replace(prev_lin_vel=new_prev)

    def reward_done(self, state: EnvState, action):
        cfg = self.cfg
        ph = state.physics
        f32 = ph.q.dtype
        v_imu = ph.base_u[0:3]
        w_imu = ph.base_u[3:6]

        _, angle_to_goal = compute_off_angle(ph.base_quat, state.goal_angle)
        abs_angle = jnp.abs(angle_to_goal)

        up = get_basis_vector(ph.base_quat, jnp.array([0.0, 0.0, 1.0], f32))
        up_proj = up[2]

        vel_reward = jnp.linalg.norm(jnp.concatenate([v_imu, w_imu]))
        vel_lin = jnp.linalg.norm(v_imu)
        vel_ang = jnp.linalg.norm(w_imu)
        pos_reward = jnp.linalg.norm(self.default_dof_pos - ph.q)
        distance_to_height = jnp.abs(1.0 - up_proj)

        # Near goal: hold still (orient_env.py:911-913).
        height_vel_pos = -(0.05 * vel_reward + 0.05 * pos_reward
                           + distance_to_height)
        # Far: -0.5|angle| - height - 0.0025*pos (orient_env.py:920-924:
        # 0.05 * pos_reward_scaled where pos_reward_scaled = 0.05*pos).
        vel_height = (-0.5 * abs_angle
                      - (distance_to_height + 0.05 * 0.05 * pos_reward))
        reward = jnp.where(angle_to_goal < 0.05, height_vel_pos, vel_height)

        done = state.done & False
        # Fall (orient_env.py:947-948).
        fell = up_proj < 0.7
        reward = jnp.where(fell, -100.0, reward)
        done = done | fell
        # Win state (orient_env.py:950-972).
        wins = (jnp.asarray(angle_to_goal < 0.05, f32)
                + jnp.asarray(pos_reward < 0.15, f32)
                + jnp.asarray(vel_ang < 0.1, f32)
                + jnp.asarray(vel_lin < 0.1, f32))
        won = wins == 4.0
        reward = jnp.where(
            won,
            1000.0 - 1000.0 * state.progress.astype(f32) / cfg.max_episode_length,
            reward)
        done = done | won
        # Drift from start > 0.3 m -> -5 (orient_env.py:1000-1009, scale :942).
        drift = jnp.linalg.norm(ph.base_pos[0:2]
                                - jnp.asarray(cfg.bez_init_pos[:2], f32))
        drifted = drift > 0.3
        reward = jnp.where(drifted, -5.0, reward)
        done = done | drifted
        # Horizon (orient_env.py:1011-1014).
        horizon = state.progress >= cfg.max_episode_length
        reward = jnp.where(horizon, 0.0, reward)
        done = done | horizon
        return reward, done
