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
        if duration == 0:
            # Goal == start: nothing to walk (reference parity — the run
            # loop early-returns on zero-duration paths,
            # soccerbot_controller.py:28-30); hold the ready pose.
            return np.array([0.0]), bot.get_angles()[None].copy()
        times = np.arange(0.0, duration + 1e-9, dt)
        angles = np.zeros((len(times), 18))
        for i, t in enumerate(times):
            bot.step_path(min(t, duration))
            angles[i] = bot.get_angles()
        return times, angles


def feedforward_targets(times: np.ndarray, angles: np.ndarray,
                        kp: float = 100.0, kd: float = 7.5,
                        h: float = 1.0 / 240.0) -> np.ndarray:
    """Velocity-lead feedforward for Stable-PD position tracking.

    The engine's Stable-PD torque is kp*(target - q) - (h*kp + kd)*qd
    (ops/engine.py); in steady tracking (q ~ q_des, qd ~ qd_des) the damping
    term causes a lag of (h*kp + kd)/kp * qd_des.  Commanding
        target = q_des + (h*kp + kd)/kp * qd_des
    cancels it exactly, which is the dominant tracking-error term for the
    walking gait (gravity torques contribute only ~tau_g/kp ~ 5 mrad).

    times/angles: the planner output (T,), (T, 18); h: physics substep.
    Returns the lead-compensated (T, 18) target plan.
    """
    qd = np.gradient(angles, times, axis=0)
    lead = (h * kp + kd) / kp
    return angles + lead * qd


def make_tau_fn(task, include_bias: bool = True):
    """Jittable inverse-dynamics torque along a desired trajectory point.

    Returns tau_of(q, qd, qdd) -> (18,) required joint torque with the base
    assumed stationary:
        tau_req = (H(q_des) @ [0, qdd_des] + bias(q_des, qd_des))[6:]
    Shared by `id_feedforward_targets` (single plan) and the batched
    multi-plan feedforward in eval/walk_standalone.py.
    """
    import jax.numpy as jnp

    from bez_isaacgym_tpu.ops import dynamics as dyn
    from bez_isaacgym_tpu.ops import kinematics as kin

    model, params = task.model, task.base_params
    mask = kin.ancestor_mask(model)
    base_pos = jnp.asarray(task.cfg.bez_init_pos, jnp.float32)
    base_quat = jnp.asarray(task.cfg.bez_init_rot, jnp.float32)

    def tau_of(q, qdv, qddv):
        frames = kin.forward_kinematics(model, q, base_pos, base_quat)
        J_lin, J_ang = kin.com_jacobians(model, frames, mask)
        u = jnp.concatenate([jnp.zeros(6, q.dtype), qdv])
        vel = dyn.body_velocities(J_lin, J_ang, u)
        m, I_w = dyn.world_inertias(model, frames,
                                    jnp.asarray(params.mass_scale, q.dtype))
        alpha0, a0 = dyn.bias_accelerations(model, frames, vel, qdv)
        H = dyn.mass_matrix(J_lin, J_ang, m, I_w,
                            jnp.asarray(params.armature, q.dtype))
        udot = jnp.concatenate([jnp.zeros(6, q.dtype), qddv])
        tau = (H @ udot)[6:]
        if include_bias:
            bias = dyn.bias_force(J_lin, J_ang, m, I_w, vel, alpha0, a0,
                                  jnp.asarray(params.gravity, q.dtype))
            tau = tau + bias[6:]
        return tau

    return tau_of


def id_feedforward_targets(task, times: np.ndarray, angles: np.ndarray,
                           include_bias: bool = True) -> np.ndarray:
    """Computed-torque feedforward via the engine's own inverse dynamics.

    Required joint torque along the desired trajectory (base assumed
    stationary, qdd from finite differences):
        tau_req = (H(q_des) @ [0, qdd_des] + bias(q_des, qd_des))[6:]
    Commanding
        target = q_des + ((h*kp + kd)*qd_des + tau_req) / kp
    turns the engine's Stable-PD (ops/engine.py:190-192) into a full
    computed-torque controller:
        tau = kp*(q_des - q) + (h*kp + kd)*(qd_des - qd) + tau_req.
    This is the VERDICT-prescribed fix for the PD-lag-dominated tracking
    error (docs/STATUS.md round-1 gap #1).
    """
    import jax
    import jax.numpy as jnp

    params = task.base_params
    kp = np.asarray(params.kp)
    kd = np.asarray(params.kd)
    h = task.cfg.dt / task.cfg.substeps
    qd = np.gradient(angles, times, axis=0)
    qdd = np.gradient(qd, times, axis=0)
    tau_of = make_tau_fn(task, include_bias)
    tau_req = np.asarray(jax.jit(jax.vmap(tau_of))(
        jnp.asarray(angles, jnp.float32), jnp.asarray(qd, jnp.float32),
        jnp.asarray(qdd, jnp.float32)))
    return angles + ((h * kp + kd) * qd + tau_req) / kp
