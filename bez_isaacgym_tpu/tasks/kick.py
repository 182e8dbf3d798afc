"""bez_kick: kick the ball toward the goal.

Pure-functional port of the reference KickEnv
(/root/reference/bez_isaacgym/tasks/kick_env.py): obs 54 (kick_env.py:118-120,
1398-1417), reward/termination kernel (kick_env.py:1198-1395).
"""

from __future__ import annotations

import jax.numpy as jnp

from bez_isaacgym_tpu.ops import sensors
from bez_isaacgym_tpu.tasks.base import BezTask, EnvState, TaskConfig

DESIRED_HEIGHT = 0.325  # kick_env.py:1125


class KickTask(BezTask):

    num_obs = 54
    has_ball = True

    def __init__(self, cfg: TaskConfig | None = None):
        super().__init__(cfg or TaskConfig())

    def observe(self, state: EnvState, action):
        ph = state.physics
        imu, new_prev = self._imu_and_heading(state)
        off_orn = sensors.compute_off_orn(ph.base_pos, ph.base_quat, state.goal)
        feet = self._feet(state)
        obs = jnp.concatenate([
            ph.q,                 # 18 dof pos
            ph.qd,                # 18 dof vel
            imu,                  # 6
            off_orn,              # 2
            feet,                 # 8
            state.ball_init,      # 2
        ])
        return obs, state._replace(prev_lin_vel=new_prev)

    def reward_done(self, state: EnvState, action):
        """kick reward + reset chain (kick_env.py:1198-1395), exact scales
        and override order."""
        cfg = self.cfg
        ph = state.physics
        f32 = ph.q.dtype

        bez_xy = ph.base_pos[0:2]
        ball_xy = ph.ball_pos[0:2]
        v_imu = ph.base_u[0:3]
        w_imu = ph.base_u[3:6]

        to_ball = ball_xy - bez_xy
        bez_to_ball_unit = to_ball / jnp.linalg.norm(to_ball).clip(1e-9)
        velocity_forward = jnp.dot(bez_to_ball_unit, v_imu[0:2])

        to_goal = state.goal - ball_xy
        to_goal_norm = jnp.linalg.norm(to_goal)
        ball_to_goal_unit = to_goal / to_goal_norm.clip(1e-9)
        ball_velocity_forward = jnp.dot(ball_to_goal_unit, ph.ball_vel[0:2])

        to_goal_init = state.goal - state.ball_init
        init_unit = to_goal_init / jnp.linalg.norm(to_goal_init).clip(1e-9)
        ball_to_goal_angle = jnp.arctan2(ball_to_goal_unit[1], ball_to_goal_unit[0])
        init_to_goal_angle = jnp.arctan2(init_unit[1], init_unit[0])
        goal_angle_diff = jnp.abs(init_to_goal_angle - ball_to_goal_angle)

        vel_reward = 0.05 * jnp.linalg.norm(jnp.concatenate([v_imu, w_imu]))
        pos_reward = 0.05 * jnp.linalg.norm(self.default_dof_pos - ph.q)
        distance_to_height = jnp.abs(DESIRED_HEIGHT - ph.base_pos[2])
        distance_kicked = jnp.linalg.norm(ball_xy - state.ball_init)

        # After first ball displacement > 0.3 m vs before (kick_env.py:1304).
        ball_height_vel_pos = (0.1 * ball_velocity_forward
                               - (distance_to_height + vel_reward + pos_reward))
        ball_vel_height = (0.1 * ball_velocity_forward
                           + 0.05 * velocity_forward - distance_to_height)
        reward = jnp.where(distance_kicked > 0.3,
                           ball_height_vel_pos, ball_vel_height)

        done = state.done & False  # fresh reset flags
        # Fall (kick_env.py:1331-1332).
        fell = ph.base_pos[2] < 0.275
        reward = jnp.where(fell, -1.0, reward)
        done = done | fell
        # Bez out of bound (kick_env.py:1340-1349).
        traveled = jnp.linalg.norm(bez_xy - jnp.asarray(cfg.bez_init_pos[:2], f32))
        oob = traveled > 0.5
        reward = jnp.where(oob, -1.0, reward)
        done = done | oob
        # Ball direction out of bound (kick_env.py:1370-1377).
        angle_oob = goal_angle_diff > 1.5708
        reward = jnp.where(angle_oob, -1.0, reward)
        done = done | angle_oob
        # Ball reached goal (kick_env.py:1380-1385).
        scored = to_goal_norm < 0.05
        reward = jnp.where(
            scored,
            100.0 - 100.0 * state.progress.astype(f32) / cfg.max_episode_length,
            reward)
        done = done | scored
        # Horizon (kick_env.py:1388-1391).
        horizon = state.progress >= cfg.max_episode_length
        reward = jnp.where(horizon, 0.0, reward)
        done = done | horizon
        return reward, done
