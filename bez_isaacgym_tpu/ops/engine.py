"""The physics step: FK -> actuation -> contact -> implicit solve -> integrate.

This module is the TPU-native replacement for the whole Isaac Gym simulate
pipeline the reference drives at 60 Hz (vec_task.py:303-349, gym.simulate at
:324).  One `step()` advances a single environment by one control period
(`dt`, default 1/60 s) using `substeps` internal integration steps; batch over
environments with `jax.vmap`, compile with `jax.jit`, shard with
`shard_map` — the entire step is one fused XLA computation.

Numerical scheme (all dense f32, no data-dependent control flow):
- generalized coords: base pos + xyzw quat + 18 joint angles; velocities
  u = [v_base_origin(world), w_base(world), qd].
- Stable-PD joint servos (implicit spring+damper via the mass-matrix
  diagonal) reproduce PhysX's implicit position drives (Kp=100/Kd=7.5,
  effort clamp 2.5: kick_env.py:322-329) without the tiny-timestep blowup
  explicit PD would suffer from the reference robot's ~2e-4 kg arm links.
- contact damping terms are folded into the LHS (one-Newton-step implicit
  Euler), keeping the regularized Coulomb friction stable at dt = 1/240.
- semi-implicit Euler integration; base orientation via quaternion exp map.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bez_isaacgym_tpu.models.bez import (BALL_INERTIA, BALL_MASS, BALL_RADIUS,
                                         BALL_ROLLING_FRICTION)
from bez_isaacgym_tpu.models.robot import DynParams, RobotModel
from bez_isaacgym_tpu.ops import contact as ct
from bez_isaacgym_tpu.ops import dynamics as dyn
from bez_isaacgym_tpu.ops import kinematics as kin
from bez_isaacgym_tpu.ops.quat import quat_integrate


class PhysicsState(NamedTuple):
    """Single-env simulation state (vmap for batches)."""

    q: jnp.ndarray            # (nq,)
    qd: jnp.ndarray           # (nq,)
    base_pos: jnp.ndarray     # (3,)
    base_quat: jnp.ndarray    # (4,) xyzw
    base_u: jnp.ndarray       # (6,) [v_origin, w] world
    ball_pos: jnp.ndarray     # (3,)
    ball_quat: jnp.ndarray    # (4,)
    ball_vel: jnp.ndarray     # (3,)
    ball_ang: jnp.ndarray     # (3,)
    # Diagnostics from the last substep (read by sensors):
    sensor_normal: jnp.ndarray       # (8,) foot sensor normal forces
    body_contact_force: jnp.ndarray  # (nb,3) net contact force per body


@dataclass(frozen=True)
class SceneConfig:
    """Static scene/integrator configuration."""

    dt: float = 1.0 / 60.0        # control period (bez_kick.yaml:129)
    substeps: int = 4             # internal steps per control period
    has_ball: bool = True
    ball_radius: float = BALL_RADIUS
    ball_mass: float = BALL_MASS
    ball_inertia: float = BALL_INERTIA
    ball_rolling_friction: float = BALL_ROLLING_FRICTION
    max_joint_vel: float = 2.0 * jnp.pi   # MX-28 cap (kick_env.py:102,327)
    coeffs: ct.ContactCoeffs = ct.ContactCoeffs()
    friction_vel_scale: float = 0.05


def default_state(model: RobotModel, cfg: SceneConfig,
                  q: jnp.ndarray, base_pos, base_quat,
                  ball_pos=(0.175, 0.0, 0.08)) -> PhysicsState:
    f = jnp.float32
    return PhysicsState(
        q=jnp.asarray(q, f), qd=jnp.zeros(model.nq, f),
        base_pos=jnp.asarray(base_pos, f), base_quat=jnp.asarray(base_quat, f),
        base_u=jnp.zeros(6, f),
        ball_pos=jnp.asarray(ball_pos, f),
        ball_quat=jnp.array([0, 0, 0, 1], f),
        ball_vel=jnp.zeros(3, f), ball_ang=jnp.zeros(3, f),
        sensor_normal=jnp.zeros(8, f),
        body_contact_force=jnp.zeros((model.nb, 3), f),
    )


def _substep(model: RobotModel, cfg: SceneConfig, mask, params: DynParams,
             state: PhysicsState, targets: jnp.ndarray, h: float) -> PhysicsState:
    f32 = state.q.dtype
    frames = kin.forward_kinematics(model, state.q, state.base_pos, state.base_quat)
    J_lin, J_ang = kin.com_jacobians(model, frames, mask)
    u = jnp.concatenate([state.base_u, state.qd])
    vel = dyn.body_velocities(J_lin, J_ang, u)
    m, I_w = dyn.world_inertias(model, frames, jnp.asarray(params.mass_scale, f32))
    alpha0, a0 = dyn.bias_accelerations(model, frames, vel, state.qd)
    H = dyn.mass_matrix(J_lin, J_ang, m, I_w, jnp.asarray(params.armature, f32))
    bias = dyn.bias_force(J_lin, J_ang, m, I_w, vel, alpha0, a0,
                          jnp.asarray(params.gravity, f32))

    # --- Stable-PD actuation (implicit spring-damper, explicit clamp) ------
    kp = jnp.asarray(params.kp, f32)
    kd = jnp.asarray(params.kd, f32)
    effort = jnp.asarray(params.effort, f32)
    tau_pd = kp * (targets - state.q) - (h * kp + kd) * state.qd
    tau_pd = jnp.clip(tau_pd, -effort, effort)
    # Regularized Coulomb joint friction, implicit viscous form.
    c_fric = jnp.asarray(params.joint_friction, f32) / (
        jnp.abs(state.qd) + cfg.friction_vel_scale)
    tau_joint = tau_pd - c_fric * state.qd
    implicit_joint = h * (h * kp + kd + c_fric)

    # --- contacts ----------------------------------------------------------
    mu = jnp.asarray(params.ground_friction, f32)
    wr = ct.robot_plane_contacts(model, frames, vel, mu, cfg.coeffs)
    sensor_normal = wr.sensor_normal
    body_cf = wr.body_force
    F_b, N_b = wr.F, wr.N

    if cfg.has_ball:
        wr2, bf_robot = ct.ball_robot_contacts(
            model, frames, vel, state.ball_pos, state.ball_vel, state.ball_ang,
            cfg.ball_radius, mu, cfg.coeffs)
        F_b = F_b + wr2.F
        N_b = N_b + wr2.N
        body_cf = body_cf + wr2.body_force
        bf_plane = ct.ball_plane_contact(
            state.ball_pos, state.ball_vel, state.ball_ang, cfg.ball_radius,
            mu, cfg.ball_rolling_friction, cfg.coeffs)
        ball_F = bf_robot.F + bf_plane.F \
            + cfg.ball_mass * jnp.asarray(params.gravity, f32)
        ball_N = bf_robot.N + bf_plane.N

    # --- implicit contact damping on the robot side ------------------------
    # One Newton step of implicit Euler: H += h * Jc^T D Jc with D the
    # (PSD-approximated) negative force/velocity Jacobian of the plane
    # contacts.  Keeps regularized friction stable on the light feet.
    cp = jnp.asarray(model.cpoint_pos, f32)
    cb = model.cpoint_body
    Rc = frames.rot[cb]
    p_c = frames.pos[cb] + jnp.einsum("cij,cj->ci", Rc, cp)
    r_c = p_c - frames.com[cb]
    Jp = J_lin[cb] - kin._skew(r_c) @ J_ang[cb]          # (nc,3,nv)
    pen = -p_c[..., 2]
    active = pen > 0.0
    fn_est = jnp.clip(cfg.coeffs.kn * pen, 0.0, None) * active
    v_c = vel.v_com[cb] + jnp.cross(vel.w[cb], r_c)
    vt_norm = jnp.linalg.norm(v_c.at[..., 2].set(0.0), axis=-1)
    d_t = mu * fn_est / (vt_norm + cfg.coeffs.vt_eps)
    d_n = cfg.coeffs.cn * active
    D = jnp.zeros(Jp.shape[:1] + (3,), f32)
    D = D.at[:, 0].set(d_t).at[:, 1].set(d_t).at[:, 2].set(d_n)
    H_c = jnp.einsum("civ,ci,ciw->vw", Jp, D, Jp)

    nv = 6 + model.nq
    H_eff = H + h * H_c
    H_eff = H_eff + jnp.diag(jnp.zeros(nv, f32).at[6:].set(implicit_joint))

    tau = jnp.zeros(nv, f32).at[6:].set(tau_joint)
    tau = tau + dyn.body_wrench_to_generalized(J_lin, J_ang, F_b, N_b) - bias
    udot = jnp.linalg.solve(H_eff, tau)

    # --- integrate (semi-implicit Euler) -----------------------------------
    u_new = u + h * udot
    qd_new = jnp.clip(u_new[6:], -cfg.max_joint_vel, cfg.max_joint_vel)
    q_new = state.q + h * qd_new
    lower = jnp.asarray(model.dof_lower, f32)
    upper = jnp.asarray(model.dof_upper, f32)
    q_clamped = jnp.clip(q_new, lower, upper)
    at_limit = (q_new < lower) | (q_new > upper)
    qd_new = jnp.where(at_limit, 0.0, qd_new)

    base_u_new = u_new[:6]
    base_pos_new = state.base_pos + h * base_u_new[:3]
    base_quat_new = quat_integrate(state.base_quat, base_u_new[3:6], h)

    if cfg.has_ball:
        ball_vel = state.ball_vel + h * ball_F / cfg.ball_mass
        ball_ang = state.ball_ang + h * ball_N / cfg.ball_inertia
        ball_pos = state.ball_pos + h * ball_vel
        ball_quat = quat_integrate(state.ball_quat, ball_ang, h)
    else:
        ball_vel, ball_ang = state.ball_vel, state.ball_ang
        ball_pos, ball_quat = state.ball_pos, state.ball_quat

    return PhysicsState(
        q=q_clamped, qd=qd_new, base_pos=base_pos_new,
        base_quat=base_quat_new, base_u=base_u_new,
        ball_pos=ball_pos, ball_quat=ball_quat,
        ball_vel=ball_vel, ball_ang=ball_ang,
        sensor_normal=sensor_normal, body_contact_force=body_cf,
    )


def step(model: RobotModel, cfg: SceneConfig, mask, params: DynParams,
         state: PhysicsState, targets: jnp.ndarray) -> PhysicsState:
    """Advance one control period (cfg.dt) with cfg.substeps internal steps."""
    h = cfg.dt / cfg.substeps
    for _ in range(cfg.substeps):
        state = _substep(model, cfg, mask, params, state, targets, h)
    return state


def make_step_fn(model: RobotModel, cfg: SceneConfig):
    """Returns step_fn(params, state, targets) -> state, closing over the
    static model (constants folded at trace time)."""
    mask = kin.ancestor_mask(model)

    def step_fn(params: DynParams, state: PhysicsState,
                targets: jnp.ndarray) -> PhysicsState:
        return step(model, cfg, mask, params, state, targets)

    return step_fn
