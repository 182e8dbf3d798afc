"""Compliant contact model: point-plane, sphere-plane, sphere-box.

Replaces PhysX's TGS contact solver (bez_kick.yaml:134-147) with a smooth,
differentiable penalty model suited to TPU: branch-free `where` masking over a
*static* set of candidate contacts (box corners from the URDF collision
geometry, the ball sphere), so the jitted step has fixed shapes and no
data-dependent control flow.  Normal: spring-damper (restitution ~ 0, matching
the reference plane config bez_kick.yaml:13-16).  Friction: regularized
Coulomb, differentiable for the SQP stage.

Also produces the contact diagnostics the reference reads back from PhysX
(`acquire_net_contact_force_tensor`, kick_env.py:146,187-196): per-foot-sensor
normal forces and per-body net contact forces.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bez_isaacgym_tpu.models.robot import RobotModel
from bez_isaacgym_tpu.ops.dynamics import BodyVel
from bez_isaacgym_tpu.ops.kinematics import BodyFrames


class ContactCoeffs(NamedTuple):
    """Static penalty coefficients (set once per scene, not traced)."""

    kn: float = 6000.0      # normal spring [N/m]
    cn: float = 60.0        # normal damping [N*s/m]
    vt_eps: float = 0.02    # tangential velocity regularization [m/s]
    ball_kn: float = 3000.0
    ball_cn: float = 8.0


class Wrenches(NamedTuple):
    F: jnp.ndarray              # (nb,3) world force at COM per body
    N: jnp.ndarray              # (nb,3) world torque about COM per body
    sensor_normal: jnp.ndarray  # (8,)  summed normal force per foot sensor slot
    body_force: jnp.ndarray     # (nb,3) net *contact* force per body (world)


def _friction_dir(vt: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Smooth unit vector along tangential velocity.

    sqrt(|vt|^2 + eps^2) (not norm+eps): d|vt|/dvt is NaN at vt=0 and the
    NaN tangent leaks through the 0*NaN product into the friction force
    under jacfwd — the SQP linearization path.  This form is C^inf."""
    ssq = jnp.sum(vt * vt, axis=-1, keepdims=True)
    return vt / jnp.sqrt(ssq + eps * eps)


def robot_plane_contacts(model: RobotModel, frames: BodyFrames, vel: BodyVel,
                         mu: jnp.ndarray, coeffs: ContactCoeffs) -> Wrenches:
    """Ground (z=0 plane) contact forces for all candidate points."""
    cp = jnp.asarray(model.cpoint_pos, dtype=frames.pos.dtype)      # (nc,3)
    cb = model.cpoint_body                                          # static (nc,)
    R = frames.rot[cb]                                              # (nc,3,3)
    p = frames.pos[cb] + jnp.einsum("cij,cj->ci", R, cp)            # world points
    r = p - frames.com[cb]
    v = vel.v_com[cb] + jnp.cross(vel.w[cb], r)                     # point velocity

    pen = -p[..., 2]
    vn = v[..., 2]
    fn = jnp.where(pen > 0.0, coeffs.kn * pen - coeffs.cn * vn, 0.0)
    fn = jnp.clip(fn, 0.0, None)

    vt = v.at[..., 2].set(0.0)
    ft = -mu * fn[..., None] * _friction_dir(vt, coeffs.vt_eps)
    f = ft.at[..., 2].set(fn)                                       # (nc,3)

    F = jax.ops.segment_sum(f, cb, num_segments=model.nb)
    N = jax.ops.segment_sum(jnp.cross(r, f), cb, num_segments=model.nb)

    # Foot sensors: sum normal force into slots 0..7 (slot -1 -> bucket 8).
    slots = jnp.where(model.cpoint_sensor >= 0, model.cpoint_sensor, 8)
    sensor = jax.ops.segment_sum(fn, slots, num_segments=9)[:8]
    return Wrenches(F=F, N=N, sensor_normal=sensor, body_force=F)


class BallForces(NamedTuple):
    F: jnp.ndarray  # (3,) world force on ball
    N: jnp.ndarray  # (3,) world torque on ball about its center


def ball_plane_contact(ball_pos: jnp.ndarray, ball_vel: jnp.ndarray,
                       ball_ang: jnp.ndarray, radius: float, mu: jnp.ndarray,
                       rolling_friction: float,
                       coeffs: ContactCoeffs) -> BallForces:
    """Sphere vs ground plane, with Coulomb + rolling friction
    (ball.urdf contact block: lateral 0.99, rolling/spinning 0.01)."""
    pen = radius - ball_pos[2]
    contact = ball_pos + jnp.array([0.0, 0.0, -radius], dtype=ball_pos.dtype)
    v = ball_vel + jnp.cross(ball_ang, contact - ball_pos)
    fn = jnp.where(pen > 0.0, coeffs.ball_kn * pen - coeffs.ball_cn * v[2], 0.0)
    fn = jnp.clip(fn, 0.0, None)
    vt = v.at[2].set(0.0)
    ft = -mu * fn * _friction_dir(vt, coeffs.vt_eps)
    f = ft.at[2].set(fn)
    torque = jnp.cross(contact - ball_pos, f)
    # Rolling resistance opposing spin (smooth at ball_ang=0 — see
    # _friction_dir for why norm+eps is not differentiable there).
    w_norm = jnp.sqrt(jnp.sum(ball_ang * ball_ang) + 1e-12)
    torque = torque - rolling_friction * fn * radius * ball_ang / w_norm
    return BallForces(F=f, N=torque)


def ball_robot_contacts(model: RobotModel, frames: BodyFrames, vel: BodyVel,
                        ball_pos: jnp.ndarray, ball_vel: jnp.ndarray,
                        ball_ang: jnp.ndarray, radius: float, mu: jnp.ndarray,
                        coeffs: ContactCoeffs) -> tuple[Wrenches, BallForces]:
    """Ball sphere vs every robot collision box (kick/goalie interaction)."""
    dtype = frames.pos.dtype
    bb = model.box_body                                             # static (nbx,)
    Rb = frames.rot[bb]
    box_c = frames.pos[bb] + jnp.einsum("kij,kj->ki", Rb,
                                        jnp.asarray(model.box_pos, dtype=dtype))
    Rbox = jnp.einsum("kij,kjl->kil", Rb, jnp.asarray(model.box_rot, dtype=dtype))
    half = jnp.asarray(model.box_half, dtype=dtype)

    # Closest point on each box to the ball center.
    local = jnp.einsum("kji,kj->ki", Rbox, ball_pos[None, :] - box_c)
    clamped = jnp.clip(local, -half, half)
    closest = box_c + jnp.einsum("kij,kj->ki", Rbox, clamped)
    delta = ball_pos[None, :] - closest
    # Smooth at delta=0 (ball center exactly on a box face/inside).
    dist = jnp.sqrt(jnp.sum(delta * delta, axis=-1) + 1e-12)
    # If the center is inside the box, dist ~ 0; push up as a safe fallback.
    n = jnp.where(dist[:, None] > 1e-6, delta / (dist[:, None] + 1e-9),
                  jnp.array([0.0, 0.0, 1.0], dtype=dtype))
    pen = radius - dist

    v_ball_pt = ball_vel + jnp.cross(ball_ang, closest - ball_pos)
    r_body = closest - frames.com[bb]
    v_body_pt = vel.v_com[bb] + jnp.cross(vel.w[bb], r_body)
    rel = v_ball_pt - v_body_pt
    vn = jnp.sum(rel * n, axis=-1)

    fn = jnp.where(pen > 0.0, coeffs.ball_kn * pen - coeffs.ball_cn * vn, 0.0)
    fn = jnp.clip(fn, 0.0, None)
    vt = rel - vn[:, None] * n
    f_ball = fn[:, None] * n - mu * fn[:, None] * _friction_dir(vt, coeffs.vt_eps)

    F_ball = jnp.sum(f_ball, axis=0)
    N_ball = jnp.sum(jnp.cross(closest - ball_pos, f_ball), axis=0)

    F = jax.ops.segment_sum(-f_ball, bb, num_segments=model.nb)
    N = jax.ops.segment_sum(jnp.cross(r_body, -f_ball), bb, num_segments=model.nb)
    wr = Wrenches(F=F, N=N,
                  sensor_normal=jnp.zeros(8, dtype=dtype), body_force=F)
    return wr, BallForces(F=F_ball, N=N_ball)
