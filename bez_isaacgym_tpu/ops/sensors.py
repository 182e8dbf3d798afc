"""Sensor models: IMU, heading ("off orientation"), foot contact sensors.

Pure-JAX ports of the reference TorchScript sensor kernels, reproducing their
*actual* semantics bit-for-bit (including documented quirks):

- compute_imu           (kick_env.py:888-930)
- compute_off_orn       (kick_env.py:933-962)
- compute_feet_sensors_cleats     (kick_env.py:1044-1069)
- compute_feet_sensors_no_cleats  (kick_env.py:966-1040)

Single-env shapes; vmap over environments.
"""

from __future__ import annotations

import jax.numpy as jnp

from bez_isaacgym_tpu.ops.quat import get_euler_xyz, imu_rotation_matrix

# Limits (kick_env.py:99-102).
IMU_MAX_ANG_VEL = 8.7266
IMU_MAX_LIN_ACC = 2.0 * 9.81


def compute_imu(root_orient: jnp.ndarray, root_vel: jnp.ndarray,
                root_ang: jnp.ndarray, prev_lin_vel: jnp.ndarray,
                dt: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """IMU observation (6,) = [lin_acc(3), ang_vel(3)] and new prev_lin_vel.

    Reference quirks reproduced deliberately (kick_env.py:917-928):
    - "gravity" is the unit -z vector, not 9.81-scaled;
    - the rotation matrix interprets the xyzw quaternion with the wxyz
      formula (see ops.quat.imu_rotation_matrix);
    - angular velocity stays in the world frame.
    """
    lin_acc = (root_vel - prev_lin_vel) / dt
    lin_acc = lin_acc - jnp.array([0.0, 0.0, -1.0], dtype=root_vel.dtype)
    rot = imu_rotation_matrix(root_orient)
    lin_acc = rot @ lin_acc
    lin_acc = jnp.clip(lin_acc, -IMU_MAX_LIN_ACC, IMU_MAX_LIN_ACC)
    ang_vel = jnp.clip(root_ang, -IMU_MAX_ANG_VEL, IMU_MAX_ANG_VEL)
    return jnp.concatenate([lin_acc, ang_vel]), root_vel


def compute_off_orn(root_pos: jnp.ndarray, root_orient: jnp.ndarray,
                    goal: jnp.ndarray) -> jnp.ndarray:
    """(2,) = (sin, -cos) of the angle between heading and the goal direction
    (kick_env.py:933-962)."""
    to_goal = goal - root_pos[0:2]
    unit = to_goal / jnp.linalg.norm(to_goal).clip(1e-9)
    _, _, yaw = get_euler_xyz(root_orient)
    d2 = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)])
    cos = jnp.dot(d2, unit)
    # |cross| of the z-padded vectors (kick_env.py:955-959).
    sin = jnp.abs(unit[0] * d2[1] - unit[1] * d2[0])
    return jnp.stack([sin, -cos])


def feet_sensors_cleats(sensor_normal: jnp.ndarray,
                        threshold: float = 1.0) -> jnp.ndarray:
    """(8,) in {-1, 1}: cleat contact-force norm > 1 N (kick_env.py:1053-1061).

    Our engine's per-cleat normal force stands in for PhysX's per-cleat-body
    net contact force norm (normal-dominated for ground contact).
    """
    return jnp.where(sensor_normal > threshold, 1.0, -1.0).astype(jnp.float32)


def _foot_case_table(force: jnp.ndarray) -> jnp.ndarray:
    """(4,) corner pattern from one foot's net contact force (3,).

    Faithful port of compute_feet_sensors_no_cleats (kick_env.py:966-1040).
    As written, the reference's case logic only distinguishes zero vs nonzero
    force components (cases 2,5,6,7,10 are unreachable); we reproduce that
    actual behavior, not the commented intent.
    """
    f = jnp.where(jnp.abs(force) > 0.01, force, 0.0)
    fx_nonzero = jnp.abs(f[0]) > 0.0
    fy_nonzero = jnp.abs(f[1]) > 0.0

    case_1 = jnp.array([1.0, -1.0, -1.0, -1.0])    # fx!=0, fy!=0
    case_3 = jnp.array([1.0, -1.0, 1.0, -1.0])     # fx!=0, fy==0
    case_9 = jnp.array([1.0, 1.0, -1.0, -1.0])     # fx==0, fy!=0
    case_11 = jnp.array([1.0, 1.0, 1.0, 1.0])      # fx==0, fy==0
    case_12 = jnp.array([-1.0, -1.0, -1.0, -1.0])  # fz < 1 N

    out = jnp.where(fx_nonzero,
                    jnp.where(fy_nonzero, case_1, case_3),
                    jnp.where(fy_nonzero, case_9, case_11))
    return jnp.where(f[2] < 1.0, case_12, out).astype(jnp.float32)


def feet_sensors_no_cleats(left_force: jnp.ndarray,
                           right_force: jnp.ndarray) -> jnp.ndarray:
    """(8,) = [left 4 corners, right 4 corners] from per-foot net contact
    forces (kick_env.py:497-582)."""
    return jnp.concatenate([_foot_case_table(left_force),
                            _foot_case_table(right_force)])
