"""bez_goalie: block a ball shot at the robot at -10 m/s.

Restoration of the reference's bit-rotted GoalieEnv
(/root/reference/bez_isaacgym/tasks/goalie_env.py — stale API, see SURVEY.md
quirks) from its task spec: config resources/config/bez_goalie.yaml (ball at
(2,0,0.1) with vx=-10: :17-21; plane friction 0.35: :7-8; bez at z=0.29: :12;
Kd=0, armature 0.01: :26,:81; episode 25 s: :99) and reward kernel
(goalie_env.py:528-651).

The reference config lacks a goalState (the stale env would crash reading
it); we define goal=(2,0) — the shot origin — so clearing the ball back where
it came from is rewarded.
"""

from __future__ import annotations

import jax.numpy as jnp

from bez_isaacgym_tpu.ops import sensors
from bez_isaacgym_tpu.tasks.base import BezTask, EnvState, TaskConfig

DESIRED_HEIGHT = 0.27  # goalie_env.py:561


def goalie_config() -> TaskConfig:
    return TaskConfig(
        episode_length_s=25.0,
        damping=0.0,
        plane_static_friction=0.35,
        bez_init_pos=(0.0, 0.0, 0.29),
        ball_init_pos=(2.0, 0.0, 0.1),
        ball_init_vel=(-10.0, 0.0, 0.0),
        goal=(2.0, 0.0),
        stl=False, cleats=False,   # soccerbot_box.urdf (bez_goalie.yaml:106)
    )


class GoalieTask(BezTask):

    num_obs = 54
    has_ball = True

    def __init__(self, cfg: TaskConfig | None = None):
        super().__init__(cfg or goalie_config())

    def observe(self, state: EnvState, action):
        ph = state.physics
        imu, new_prev = self._imu_and_heading(state)
        off_orn = sensors.compute_off_orn(ph.base_pos, ph.base_quat, state.goal)
        feet = self._feet(state)
        obs = jnp.concatenate([ph.q, ph.qd, imu, off_orn, feet,
                               state.ball_init])
        return obs, state._replace(prev_lin_vel=new_prev)

    def reward_done(self, state: EnvState, action):
        """goalie reward (goalie_env.py:528-651), exact scales and order."""
        cfg = self.cfg
        ph = state.physics
        f32 = ph.q.dtype
        bez_xy = ph.base_pos[0:2]
        ball_xy = ph.ball_pos[0:2]
        v_imu = ph.base_u[0:3]
        w_imu = ph.base_u[3:6]

        to_ball = ball_xy - bez_xy
        unit_ball = to_ball / jnp.linalg.norm(to_ball).clip(1e-9)
        velocity_forward = jnp.dot(unit_ball, v_imu[0:2])

        to_goal = state.goal - ball_xy
        unit_goal = to_goal / jnp.linalg.norm(to_goal).clip(1e-9)
        ball_velocity_forward = jnp.dot(unit_goal, ph.ball_vel[0:2])
        ball_speed = jnp.linalg.norm(ph.ball_vel[0:2])

        vel_reward = 0.05 * jnp.linalg.norm(w_imu)
        pos_reward = 0.05 * jnp.linalg.norm(self.default_dof_pos - ph.q)
        distance_to_height = DESIRED_HEIGHT - ph.base_pos[2]   # signed!
        distance_kicked = jnp.linalg.norm(ball_xy - state.ball_init)

        # goalie_env.py:572-581 (note vel_pos = vel - pos, and
        # height_vel_pos = height - vel_pos).
        vel_pos = vel_reward - pos_reward
        height_vel_pos = distance_to_height - vel_pos
        ball_height_vel_pos = 0.2 * ball_velocity_forward - height_vel_pos
        vel_height = 0.05 * velocity_forward - distance_to_height
        ball_vel_height = 0.2 * ball_velocity_forward + vel_height
        reward = jnp.where(distance_kicked > 0.3,
                           ball_height_vel_pos, ball_vel_height)

        done = state.done & False
        # Ball got past the robot (goalie_env.py:625-632).
        passed = to_ball[0] < 0.0
        reward = jnp.where(passed, -10000.0, reward)
        done = done | passed
        # Ball stopped: episode over, reward unchanged (goalie_env.py:638-639).
        done = done | (ball_speed < 0.05)
        # Horizon (goalie_env.py:645-649).
        horizon = state.progress >= cfg.max_episode_length
        reward = jnp.where(horizon, 0.0, reward)
        done = done | horizon
        return reward, done
