"""The physics step: FK -> actuation -> contact -> implicit solve -> integrate.

This module is the TPU-native replacement for the whole Isaac Gym simulate
pipeline the reference drives at 60 Hz (vec_task.py:303-349, gym.simulate at
:324).  One `step()` advances a single environment by one control period
(`dt`, default 1/60 s) using `substeps` internal integration steps; the
batched variant (`make_batched_step_fn`) is the production path — the whole
step is one fused XLA computation over the env axis.

Numerical scheme (all dense f32, no data-dependent control flow):
- generalized coords: base pos + xyzw quat + 18 joint angles; velocities
  u = [v_base_origin(world), w_base(world), qd].
- Stable-PD joint servos (implicit spring+damper via the mass-matrix
  diagonal) reproduce PhysX's implicit position drives (Kp=100/Kd=7.5,
  effort clamp 2.5: kick_env.py:322-329) without the tiny-timestep blowup
  explicit PD would suffer from the reference robot's ~2e-4 kg arm links.
- contact damping terms are folded into the LHS (one-Newton-step implicit
  Euler) via per-body 6x6 moment matrices, keeping regularized Coulomb
  friction stable at dt = 1/240.
- semi-implicit Euler integration; base orientation via quaternion exp map.

Performance notes (profiled on TPU v5e at batch 8192):
- the linear solve runs on explicitly batched (B,nv,nv) arrays OUTSIDE the
  per-env vmap — XLA's LU on vmapped 1-env solves embedded in the fused
  program costs ~50 ms/step vs ~0.05 ms for the batched form;
- the implicit-contact LHS term is accumulated as 17 scalar moments per
  contact point (one segment_sum) instead of (nc,3,nv) point Jacobians,
  which XLA otherwise materializes and layout-copies (~16 ms/step).
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
from bez_isaacgym_tpu.ops.linalg import cholesky_solve_unrolled
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
    # Stability guards for extreme impacts (goalie: ball shot at -10 m/s,
    # bez_goalie.yaml:17-21 — a single penetrating substep otherwise
    # cascades penalty forces into inf base velocities and NaNs). Normal
    # locomotion stays far below these caps.
    max_base_lin_vel: float = 20.0        # m/s
    max_base_ang_vel: float = 50.0        # rad/s
    max_ball_vel: float = 30.0            # m/s (kicked/shot ball)
    coeffs: ct.ContactCoeffs = ct.ContactCoeffs()
    friction_vel_scale: float = 0.05


class _SubstepAux(NamedTuple):
    """Carries everything _integrate needs besides the solved udot."""

    ball_F: jnp.ndarray
    ball_N: jnp.ndarray
    sensor_normal: jnp.ndarray
    body_cf: jnp.ndarray
    u: jnp.ndarray


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


def _contact_damping_W(model: RobotModel, cfg: SceneConfig, frames, vel,
                       mu, f32):
    """Per-body implicit-contact damping matrices W_b (nb,6,6).

    W_b = sum_{c in b} M_c^T D_c M_c with M_c = [I3, -skew(r_c)] and
    D_c = diag(d_t, d_t, d_n).  Accumulated via 16 scalar moments per point
    (one segment_sum) — no (nc,3,nv) tensors.  Folded into the spatial
    inertia G_b so the whole LHS is ONE J6^T G J6 contraction.
    """
    cp = jnp.asarray(model.cpoint_pos, f32)
    cb = model.cpoint_body
    Rc = frames.rot[cb]
    p_c = frames.pos[cb] + jnp.einsum("cij,cj->ci", Rc, cp)
    r = p_c - frames.com[cb]
    pen = -p_c[..., 2]
    active = pen > 0.0
    fn_est = jnp.clip(cfg.coeffs.kn * pen, 0.0, None) * active
    v_c = vel.v_com[cb] + jnp.cross(vel.w[cb], r)
    # Smooth sqrt(ssq + eps^2) form (matches contact._friction_dir; the
    # norm's NaN tangent at vt=0 otherwise leaks into SQP linearization).
    vt_norm = jnp.sqrt(v_c[..., 0] ** 2 + v_c[..., 1] ** 2
                       + cfg.coeffs.vt_eps ** 2)
    d_t = mu * fn_est / vt_norm
    d_n = cfg.coeffs.cn * active
    g = d_n - d_t

    x, y, z = r[..., 0], r[..., 1], r[..., 2]
    cols = jnp.stack([
        d_t,                      # 0
        d_t * x, d_t * y, d_t * z,      # 1-3
        d_t * x * x, d_t * y * y, d_t * z * z,   # 4-6
        d_t * x * y, d_t * x * z, d_t * y * z,   # 7-9
        g,                        # 10
        g * x, g * y,             # 11-12
        g * x * x, g * y * y, g * x * y,   # 13-15
    ], axis=-1)                                   # (nc, 16)
    m = jax.ops.segment_sum(cols, cb, num_segments=model.nb)  # (nb,16)
    (s_dt, sx, sy, sz, sxx, syy, szz, sxy, sxz, syz,
     s_g, s_gx, s_gy, s_gxx, s_gyy, s_gxy) = [m[:, i] for i in range(16)]
    zero = jnp.zeros_like(s_dt)

    # A = sum D = dt*I + g*e3 e3^T.
    A = jnp.stack([
        jnp.stack([s_dt, zero, zero], -1),
        jnp.stack([zero, s_dt, zero], -1),
        jnp.stack([zero, zero, s_dt + s_g], -1),
    ], -2)
    # B = sum -D S.
    B = jnp.stack([
        jnp.stack([zero, sz, -sy], -1),
        jnp.stack([-sz, zero, sx], -1),
        jnp.stack([sy + s_gy, -(sx + s_gx), zero], -1),
    ], -2)
    # E = sum S^T D S.
    E00 = szz + syy + s_gyy
    E01 = -(sxy + s_gxy)
    E02 = -sxz
    E11 = szz + sxx + s_gxx
    E12 = -syz
    E22 = sxx + syy
    E = jnp.stack([
        jnp.stack([E00, E01, E02], -1),
        jnp.stack([E01, E11, E12], -1),
        jnp.stack([E02, E12, E22], -1),
    ], -2)
    return jnp.concatenate([
        jnp.concatenate([A, B], -1),
        jnp.concatenate([jnp.swapaxes(B, -1, -2), E], -1),
    ], -2)                                        # (nb,6,6)


def _prepare(model: RobotModel, cfg: SceneConfig, mask, params: DynParams,
             state: PhysicsState, targets: jnp.ndarray, h: float):
    """Everything up to the linear solve: returns (H_eff, tau, aux)."""
    f32 = state.q.dtype
    frames = kin.forward_kinematics(model, state.q, state.base_pos, state.base_quat)
    J_lin, J_ang = kin.com_jacobians(model, frames, mask)
    u = jnp.concatenate([state.base_u, state.qd])
    vel = dyn.body_velocities(J_lin, J_ang, u)
    m, I_w = dyn.world_inertias(model, frames, jnp.asarray(params.mass_scale, f32))
    alpha0, a0 = dyn.bias_accelerations(model, frames, vel, state.qd)

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
    else:
        ball_F = jnp.zeros(3, f32)
        ball_N = jnp.zeros(3, f32)

    # --- one fused LHS/RHS assembly ----------------------------------------
    # G_b = blockdiag(m_b I3, I_w_b) + h * W_b (spatial inertia at the COM
    # plus implicit contact damping); H_eff = sum_b J6_b^T G_b J6_b.
    W = _contact_damping_W(model, cfg, frames, vel, mu, f32)
    nb = model.nb
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=f32), (nb, 3, 3))
    zero33 = jnp.zeros((nb, 3, 3), f32)
    M_spatial = jnp.concatenate([
        jnp.concatenate([m[:, None, None] * eye3, zero33], -1),
        jnp.concatenate([zero33, I_w], -1),
    ], -2)                                               # (nb,6,6)
    G = M_spatial + h * W
    J6 = jnp.concatenate([J_lin, J_ang], axis=1)         # (nb,6,nv)
    T = jnp.einsum("bac,bcw->baw", G, J6)
    H_eff = jnp.einsum("bav,baw->vw", J6, T)

    nv = 6 + model.nq
    diag_extra = jnp.zeros(nv, f32).at[6:].set(
        jnp.asarray(params.armature, f32) + implicit_joint)
    H_eff = H_eff + jnp.diag(diag_extra)

    # RHS: tau = S tau_joint + J6^T [F - m(a0 - g); N - I alpha0 - w x I w].
    grav = jnp.asarray(params.gravity, f32)
    f_net = F_b - m[:, None] * (a0 - grav[None, :])
    n_net = N_b - jnp.einsum("bij,bj->bi", I_w, alpha0) \
        - jnp.cross(vel.w, jnp.einsum("bij,bj->bi", I_w, vel.w))
    wrench6 = jnp.concatenate([f_net, n_net], axis=-1)   # (nb,6)
    tau = jnp.zeros(nv, f32).at[6:].set(tau_joint)
    tau = tau + jnp.einsum("bav,ba->v", J6, wrench6)
    aux = _SubstepAux(ball_F=ball_F, ball_N=ball_N,
                      sensor_normal=sensor_normal, body_cf=body_cf, u=u)
    return H_eff, tau, aux


def _integrate(model: RobotModel, cfg: SceneConfig, params: DynParams,
               state: PhysicsState, udot: jnp.ndarray, aux: _SubstepAux,
               h: float) -> PhysicsState:
    """Semi-implicit Euler update from the solved accelerations."""
    f32 = state.q.dtype
    u_new = aux.u + h * udot
    qd_new = jnp.clip(u_new[6:], -cfg.max_joint_vel, cfg.max_joint_vel)
    q_new = state.q + h * qd_new
    # Joint limits come from params when present (per-env DR of the DOF
    # lower/upper props, bez_kick.yaml:205-214), else the model's.
    lower = (jnp.asarray(params.dof_lower, f32)
             if params.dof_lower is not None
             else jnp.asarray(model.dof_lower, f32))
    upper = (jnp.asarray(params.dof_upper, f32)
             if params.dof_upper is not None
             else jnp.asarray(model.dof_upper, f32))
    q_clamped = jnp.clip(q_new, lower, upper)
    at_limit = (q_new < lower) | (q_new > upper)
    qd_new = jnp.where(at_limit, 0.0, qd_new)

    base_u_new = jnp.concatenate([
        jnp.clip(u_new[0:3], -cfg.max_base_lin_vel, cfg.max_base_lin_vel),
        jnp.clip(u_new[3:6], -cfg.max_base_ang_vel, cfg.max_base_ang_vel)])
    base_pos_new = state.base_pos + h * base_u_new[:3]
    base_quat_new = quat_integrate(state.base_quat, base_u_new[3:6], h)

    if cfg.has_ball:
        ball_vel = jnp.clip(state.ball_vel + h * aux.ball_F / cfg.ball_mass,
                            -cfg.max_ball_vel, cfg.max_ball_vel)
        ball_ang = state.ball_ang + h * aux.ball_N / cfg.ball_inertia
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
        sensor_normal=aux.sensor_normal, body_contact_force=aux.body_cf,
    )


def _substep(model: RobotModel, cfg: SceneConfig, mask, params: DynParams,
             state: PhysicsState, targets: jnp.ndarray, h: float) -> PhysicsState:
    """Single-env substep (tests/CPU path); batched path lives in
    make_batched_step_fn."""
    import numpy as np

    from bez_isaacgym_tpu.ops.linalg import solve_spd_ordered_single

    H_eff, tau, aux = _prepare(model, cfg, mask, params, state, targets, h)
    nv = 6 + model.nq
    order = np.concatenate([np.arange(6, nv), np.arange(6)])
    udot = solve_spd_ordered_single(H_eff, tau, order)
    return _integrate(model, cfg, params, state, udot, aux, h)


def step(model: RobotModel, cfg: SceneConfig, mask, params: DynParams,
         state: PhysicsState, targets: jnp.ndarray) -> PhysicsState:
    """Advance one control period (cfg.dt) with cfg.substeps internal steps."""
    h = cfg.dt / cfg.substeps
    for _ in range(cfg.substeps):
        state = _substep(model, cfg, mask, params, state, targets, h)
    return state


def make_step_fn(model: RobotModel, cfg: SceneConfig):
    """Single-env step_fn(params, state, targets) -> state (vmap-able)."""
    mask = kin.ancestor_mask(model)

    def step_fn(params: DynParams, state: PhysicsState,
                targets: jnp.ndarray) -> PhysicsState:
        return step(model, cfg, mask, params, state, targets)

    return step_fn


def make_batched_step_fn(model: RobotModel, cfg: SceneConfig,
                         batched_params: bool = True):
    """Production batched step: step_fn(params, states, targets) -> states.

    states/targets carry a leading env axis; params too when batched_params
    (per-env domain randomization).  The linear solve runs on the explicitly
    batched (B,nv,nv) system — see the module docstring perf notes.
    """
    import numpy as np

    from bez_isaacgym_tpu.ops.linalg import solve_spd_ordered

    mask = kin.ancestor_mask(model)
    h = cfg.dt / cfg.substeps
    p_ax = 0 if batched_params else None
    nv = 6 + model.nq
    # Eliminate joint DOFs before the base: joints-first Cholesky is the
    # f32-stable ordering for articulated-body mass matrices (see linalg).
    order = np.concatenate([np.arange(6, nv), np.arange(6)])

    prep = jax.vmap(
        lambda p, s, t: _prepare(model, cfg, mask, p, s, t, h),
        in_axes=(p_ax, 0, 0))
    integ = jax.vmap(
        lambda p, s, u, a: _integrate(model, cfg, p, s, u, a, h),
        in_axes=(p_ax, 0, 0, 0))

    def substep(states, params, targets):
        H_eff, tau, aux = prep(params, states, targets)
        udot = solve_spd_ordered(H_eff, tau, order)
        return integ(params, states, udot, aux)

    def step_fn(params, states: PhysicsState, targets: jnp.ndarray):
        if cfg.substeps == 1:
            return substep(states, params, targets)
        # lax.scan: compile the substep body once (4x faster compiles than
        # unrolling; the substep graph is ~1k ops).
        out, _ = jax.lax.scan(
            lambda s, _: (substep(s, params, targets), None),
            states, None, length=cfg.substeps)
        return out

    return step_fn
