"""Articulated rigid-body dynamics: mass matrix + bias forces (world frame).

TPU-native replacement for the PhysX TGS solver the reference calls through
`gym.simulate` (/root/reference/bez_isaacgym/tasks/base/vec_task.py:324).

Formulation: projected Newton-Euler ("Jacobian form" of CRBA/RNEA).  With
generalized velocity u = [v_base_origin, w_base, qd] (nv = 6 + nq):

    H(q)  = sum_i  J_lin_i^T m_i J_lin_i  +  J_ang_i^T I_i J_ang_i
    bias  = sum_i  J_lin_i^T m_i (a0_i - g) + J_ang_i^T (I_i alpha0_i + w_i x I_i w_i)

where (a0, alpha0) are the velocity-product accelerations (qdd = 0), computed
by one forward recursion over the (unrolled, nb=19) tree.  Everything is dense
f32 linear algebra that XLA tiles onto the MXU when vmapped over envs; there
is no data-dependent control flow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from bez_isaacgym_tpu.models.robot import RobotModel
from bez_isaacgym_tpu.ops.kinematics import BodyFrames


class BodyVel(NamedTuple):
    w: jnp.ndarray       # (nb,3) world angular velocity
    v_com: jnp.ndarray   # (nb,3) world COM linear velocity


def body_velocities(J_lin: jnp.ndarray, J_ang: jnp.ndarray,
                    u: jnp.ndarray) -> BodyVel:
    return BodyVel(w=J_ang @ u, v_com=J_lin @ u)


def world_inertias(model: RobotModel, frames: BodyFrames,
                   mass_scale: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-body mass and world-frame rotational inertia about COM.

    mass_scale implements the reference's rigid-body mass domain randomization
    (vec_task.py:646-713, bez_kick.yaml:173-180); inertia scales with mass.
    """
    m = jnp.asarray(model.mass) * mass_scale
    I_body = jnp.asarray(model.inertia) * mass_scale[:, None, None]
    I_w = jnp.einsum("bij,bjk,blk->bil", frames.rot, I_body, frames.rot)
    return m, I_w


def bias_accelerations(model: RobotModel, frames: BodyFrames, vel: BodyVel,
                       qd: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Velocity-product accelerations (qdd = 0): returns (alpha0, a_com0)."""
    w, v = vel.w, vel.v_com
    alpha = [jnp.zeros(3, dtype=qd.dtype)]
    r0 = frames.com[0] - frames.pos[0]
    a_com = [jnp.cross(w[0], jnp.cross(w[0], r0))]
    for b in range(1, model.nb):
        p = int(model.parent[b])
        d = b - 1
        aj = frames.axis_w[d]
        r_pa = frames.anchor[d] - frames.com[p]
        r_ac = frames.com[b] - frames.anchor[d]
        alpha_b = alpha[p] + jnp.cross(w[p], aj * qd[d])
        a_anchor = a_com[p] + jnp.cross(alpha[p], r_pa) \
            + jnp.cross(w[p], jnp.cross(w[p], r_pa))
        a_com_b = a_anchor + jnp.cross(alpha_b, r_ac) \
            + jnp.cross(w[b], jnp.cross(w[b], r_ac))
        alpha.append(alpha_b)
        a_com.append(a_com_b)
    return jnp.stack(alpha), jnp.stack(a_com)


def mass_matrix(J_lin: jnp.ndarray, J_ang: jnp.ndarray, m: jnp.ndarray,
                I_w: jnp.ndarray, armature: jnp.ndarray) -> jnp.ndarray:
    """(nv, nv) joint-space inertia matrix with reflected rotor inertia."""
    H = jnp.einsum("b,biv,biw->vw", m, J_lin, J_lin)
    H = H + jnp.einsum("biv,bij,bjw->vw", J_ang, I_w, J_ang)
    nv = H.shape[0]
    nq = armature.shape[0]
    diag = jnp.zeros(nv, dtype=H.dtype).at[6:].set(armature)
    return H + jnp.diag(diag)


def bias_force(J_lin: jnp.ndarray, J_ang: jnp.ndarray, m: jnp.ndarray,
               I_w: jnp.ndarray, vel: BodyVel, alpha0: jnp.ndarray,
               a_com0: jnp.ndarray, gravity: jnp.ndarray) -> jnp.ndarray:
    """(nv,) generalized bias (Coriolis + gravity), to be subtracted."""
    f = m[:, None] * (a_com0 - gravity[None, :])
    n = jnp.einsum("bij,bj->bi", I_w, alpha0) \
        + jnp.cross(vel.w, jnp.einsum("bij,bj->bi", I_w, vel.w))
    return jnp.einsum("biv,bi->v", J_lin, f) + jnp.einsum("biv,bi->v", J_ang, n)


def body_wrench_to_generalized(J_lin: jnp.ndarray, J_ang: jnp.ndarray,
                               F: jnp.ndarray, N: jnp.ndarray) -> jnp.ndarray:
    """Map per-body world wrenches (force at COM F, torque N) to (nv,)."""
    return jnp.einsum("biv,bi->v", J_lin, F) + jnp.einsum("biv,bi->v", J_ang, N)


def pd_torque(q: jnp.ndarray, qd: jnp.ndarray, targets: jnp.ndarray,
              kp: jnp.ndarray, kd: jnp.ndarray, effort: jnp.ndarray,
              joint_friction: jnp.ndarray,
              friction_vel_scale: float = 0.05) -> jnp.ndarray:
    """PD position servo with torque clamp + smooth Coulomb joint friction.

    Matches the reference actuator config: driveMode pos-target, Kp=100,
    Kd=7.5, effort clamp 2.5, friction 0.1 (kick_env.py:322-329).  The
    Coulomb term is regularized with tanh so the step stays differentiable
    for the SQP stage.
    """
    tau = jnp.clip(kp * (targets - q) - kd * qd, -effort, effort)
    tau = tau - joint_friction * jnp.tanh(qd / friction_vel_scale)
    return tau
