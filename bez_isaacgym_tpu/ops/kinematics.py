"""Forward kinematics and world-frame Jacobians for the articulated body.

Replaces the closed-source PhysX/Isaac Gym kinematic pipeline the reference
drives through `gym.simulate` / `acquire_rigid_body_state_tensor`
(/root/reference/bez_isaacgym/tasks/base/vec_task.py:324,
 tasks/kick_env.py:143-196).

All functions operate on a single environment; batch with `jax.vmap`.
The body loop is unrolled at trace time (nb = 19 for Bez) — XLA fuses it into
straight-line batched code, which is the TPU-friendly formulation for small
trees x thousands of envs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from bez_isaacgym_tpu.models.robot import RobotModel
from bez_isaacgym_tpu.ops.quat import quat_to_matrix


class BodyFrames(NamedTuple):
    """World-frame kinematic quantities per movable body."""

    rot: jnp.ndarray      # (nb,3,3) body->world rotation
    pos: jnp.ndarray      # (nb,3)   body frame origin (= joint anchor for i>0)
    com: jnp.ndarray      # (nb,3)   world COM position
    axis_w: jnp.ndarray   # (nq,3)   world joint axes
    anchor: jnp.ndarray   # (nq,3)   world joint anchor points


def _axis_angle_matrix(axis: np.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotation about a *static* unit axis by a traced angle (Rodrigues)."""
    ax = jnp.asarray(axis, dtype=angle.dtype)
    K = jnp.array([[0.0, -ax[2], ax[1]],
                   [ax[2], 0.0, -ax[0]],
                   [-ax[1], ax[0], 0.0]], dtype=angle.dtype)
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.eye(3, dtype=angle.dtype) + s * K + (1.0 - c) * (K @ K)


def forward_kinematics(model: RobotModel, q: jnp.ndarray,
                       base_pos: jnp.ndarray, base_quat: jnp.ndarray) -> BodyFrames:
    """Compute world poses of all movable bodies.

    q: (nq,) joint angles; base_pos (3,); base_quat (4,) xyzw.
    """
    R0 = quat_to_matrix(base_quat)
    rots = [R0]
    poss = [base_pos]
    axes, anchors = [], []
    for b in range(1, model.nb):
        p = int(model.parent[b])
        d = b - 1
        Rp, pp = rots[p], poss[p]
        anchor = pp + Rp @ jnp.asarray(model.tree_pos[b], dtype=q.dtype)
        R_pre = Rp @ jnp.asarray(model.tree_rot[b], dtype=q.dtype)
        Rj = _axis_angle_matrix(model.axis[d], q[d])
        R = R_pre @ Rj
        rots.append(R)
        poss.append(anchor)
        axes.append(R_pre @ jnp.asarray(model.axis[d], dtype=q.dtype))
        anchors.append(anchor)
    rot = jnp.stack(rots)
    pos = jnp.stack(poss)
    com = pos + jnp.einsum("bij,bj->bi", rot, jnp.asarray(model.com, dtype=q.dtype))
    return BodyFrames(rot=rot, pos=pos, com=com,
                      axis_w=jnp.stack(axes), anchor=jnp.stack(anchors))


def ancestor_mask(model: RobotModel) -> np.ndarray:
    """(nb, nq) static bool mask: dof j moves body i."""
    mask = np.zeros((model.nb, model.nq), dtype=bool)
    for b in range(1, model.nb):
        mask[b] = mask[model.parent[b]]
        mask[b, b - 1] = True
    return mask


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    """(...,3) -> (...,3,3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)


def com_jacobians(model: RobotModel, frames: BodyFrames,
                  mask: np.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """World-frame COM Jacobians for every body.

    Generalized velocity u = [v_base_origin(3), w_base(3), qd(nq)], nv = 6+nq.
    Returns (J_lin, J_ang) with shape (nb, 3, nv) such that
    v_com_i = J_lin[i] @ u and w_i = J_ang[i] @ u.
    """
    nb, nq = model.nb, model.nq
    dtype = frames.com.dtype
    m = jnp.asarray(mask, dtype=dtype)                  # (nb, nq)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (nb, 3, 3))

    # Angular: base w columns = I; joint columns = axis * mask.
    zero3 = jnp.zeros((nb, 3, 3), dtype=dtype)
    ang_joints = jnp.einsum("da,bd->bad", frames.axis_w, m)
    J_ang = jnp.concatenate([zero3, eye, ang_joints], axis=-1)

    # Linear: v_com = v0 + w x (c - p0) + sum_j qd_j * a_j x (c - p_j).
    r0 = frames.com - frames.pos[0]                     # (nb,3)
    arm = frames.com[:, None, :] - frames.anchor[None, :, :]   # (nb,nq,3)
    lever = jnp.cross(frames.axis_w[None, :, :], arm)          # (nb,nq,3)
    lin_joints = jnp.einsum("bda,bd->bad", lever, m)
    J_lin = jnp.concatenate([eye, -_skew(r0), lin_joints], axis=-1)
    return J_lin, J_ang


def point_jacobian(J_lin_b: jnp.ndarray, J_ang_b: jnp.ndarray,
                   point: jnp.ndarray, com: jnp.ndarray) -> jnp.ndarray:
    """Jacobian of a world point rigidly attached to a body.

    v_p = v_com + w x (p - com)  =>  J_p = J_lin - skew(p - com) @ J_ang.
    Accepts broadcasting leading dims on point.
    """
    r = point - com
    return J_lin_b - _skew(r) @ J_ang_b
