"""Walking controller: drives a VecEnv with the classical walking engine.

Semantics port of the reference SoccerbotController
(resources/library/pycontrol/src/soccer_pycontrol/soccerbot_controller.py):
120 Hz loop time (PYBULLET_STEP 0.00833, :11), env.step on the 0.02 s
planner grid with IMU pitch feedback (:27-45), actions = angles - default
pose.

Also provides `plan_joint_trajectory`, which bakes the whole walk into a
dense (T, 18) array — used as the MPC warm start / tracking oracle
(SURVEY.md Phase 4) and by tests.
"""

from __future__ import annotations

import numpy as np

from bez_isaacgym_tpu.control.soccerbot import Soccerbot
from bez_isaacgym_tpu.control.transformation import Transformation

CONTROL_STEP = 0.00833   # soccerbot_controller.py:11


class SoccerbotController:

    def __init__(self, env=None):
        self.soccerbot = Soccerbot(Transformation())
        self.env = env

    def ready(self):
        self.soccerbot.ready()

    def set_goal(self, goal: Transformation):
        self.soccerbot.set_goal(goal)

    def _env_pitch(self) -> float:
        """Mean pitch of the env batch from base quaternions (the reference
        reads env 0's IMU link: soccerbot.py:362-372)."""
        import numpy as np
        from scipy.spatial.transform import Rotation

        quat = np.asarray(self.env.state.physics.base_quat)
        euler = Rotation.from_quat(quat[0]).as_euler("ZYX")
        return float(euler[1])

    def run(self, use_imu_feedback: bool = True):
        """Walk the planned path against the env (soccerbot_controller:27-45)."""
        bot = self.soccerbot
        if bot.robot_path is None or bot.robot_path.duration() == 0:
            return
        default = np.asarray(self.env.task.default_dof_pos)
        t = 0.0
        while t <= bot.robot_path.duration():
            if bot.current_step_time <= t:
                bot.step_path(t)
                if use_imu_feedback and self.env is not None:
                    bot.apply_imu_feedback(self._env_pitch())
                action = bot.get_angles() - default
                actions = np.broadcast_to(
                    action, (self.env.num_envs, action.shape[0]))
                self.env.step(actions)
                bot.current_step_time += bot.robot_path.step_size
            t += CONTROL_STEP

    def plan_joint_trajectory(self, goal: Transformation,
                              dt: float | None = None):
        """Bake the full walk into (times, angles(T,18)) without an env."""
        bot = self.soccerbot
        bot.ready()
        bot.set_goal(goal)
        dt = dt or bot.robot_path.step_size
        duration = bot.robot_path.duration()
        times = np.arange(0.0, duration + 1e-9, dt)
        angles = np.zeros((len(times), 18))
        for i, t in enumerate(times):
            bot.step_path(min(t, duration))
            angles[i] = bot.get_angles()
        return times, angles
