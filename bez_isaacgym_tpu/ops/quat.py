"""Quaternion and rotation math, xyzw convention, batched and jit-friendly.

TPU-native replacement for the reference's TorchScript helpers
(/root/reference/bez_isaacgym/utils/torch_jit_utils.py:34-195 and the
`quaternion_to_matrix` kernels at tasks/kick_env.py:857-885) and for the
numpy/scipy `Transformation` class
(/root/reference/resources/library/geometry/src/soccer_geometry/transformation.py).

All functions are pure, operate on the trailing axis, and broadcast over any
leading batch dimensions, so they can be freely `vmap`-ed / `jit`-ed.

Convention: quaternions are stored ``(x, y, z, w)`` (Isaac Gym order) unless a
function name says otherwise.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_unit(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize a quaternion."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-9)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, xyzw."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by quaternion q (body -> world if q is body pose)."""
    qvec = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qvec, v)
    return v + w * t + jnp.cross(qvec, t)


def quat_rotate_inverse(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(quat_conjugate(q), v)


def quat_axis(q: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Rotate the given basis axis (0=x,1=y,2=z) by q.

    Parity with reference `quat_axis` (torch_jit_utils.py:66-71).
    """
    basis = jnp.zeros(q.shape[:-1] + (3,), dtype=q.dtype).at[..., axis].set(1.0)
    return quat_rotate(q, basis)


def get_basis_vector(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Reference `get_basis_vector` == rotate v by q (isaacgym.torch_utils)."""
    return quat_rotate(q, v)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """xyzw quaternion -> 3x3 rotation matrix (correct convention)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.sum(q * q, axis=-1).clip(1e-12)
    o = jnp.stack(
        [
            1 - two_s * (y * y + z * z),
            two_s * (x * y - z * w),
            two_s * (x * z + y * w),
            two_s * (x * y + z * w),
            1 - two_s * (x * x + z * z),
            two_s * (y * z - x * w),
            two_s * (x * z - y * w),
            two_s * (y * z + x * w),
            1 - two_s * (x * x + y * y),
        ],
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def imu_rotation_matrix(q_xyzw: jnp.ndarray) -> jnp.ndarray:
    """Reproduces the reference IMU rotation exactly, including its quirk.

    The reference `quaternion_to_matrix` (kick_env.py:857-885) implements the
    wxyz formula but is fed Isaac Gym xyzw quaternions (kick_env.py:922), so
    the x-component lands in the scalar slot. We replicate bit-for-bit so IMU
    observations match the reference; see also SURVEY.md "quirks".
    """
    r, i, j, k = q_xyzw[..., 0], q_xyzw[..., 1], q_xyzw[..., 2], q_xyzw[..., 3]
    two_s = 2.0 / jnp.sum(q_xyzw * q_xyzw, axis=-1).clip(1e-12)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(q_xyzw.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix -> xyzw quaternion (branch-free, vmap-safe)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate computations; pick the numerically best by largest pivot.
    qw0 = jnp.sqrt(jnp.clip(1.0 + tr, 1e-12, None)) / 2.0
    q0 = jnp.stack([(m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0), qw0], axis=-1)

    qx1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, 1e-12, None)) / 2.0
    q1 = jnp.stack([qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1),
                    (m21 - m12) / (4 * qx1)], axis=-1)

    qy2 = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, 1e-12, None)) / 2.0
    q2 = jnp.stack([(m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2),
                    (m02 - m20) / (4 * qy2)], axis=-1)

    qz3 = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, 1e-12, None)) / 2.0
    q3 = jnp.stack([(m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3,
                    (m10 - m01) / (4 * qz3)], axis=-1)

    cond0 = (tr > 0.0)[..., None]
    cond1 = ((m00 > m11) & (m00 > m22))[..., None]
    cond2 = (m11 > m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    return quat_unit(q)


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Unit axis + angle -> xyzw quaternion. angle may broadcast."""
    half = 0.5 * angle
    xyz = axis * jnp.sin(half)[..., None]
    w = jnp.cos(half)[..., None]
    return jnp.concatenate([xyz, w], axis=-1)


def quat_from_euler_xyz(roll, pitch, yaw) -> jnp.ndarray:
    """Intrinsic xyz euler -> xyzw quaternion (isaacgym convention)."""
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    qw = cy * cr * cp + sy * sr * sp
    qx = cy * sr * cp - sy * cr * sp
    qy = cy * cr * sp + sy * sr * cp
    qz = sy * cr * cp - cy * sr * sp
    return jnp.stack([qx, qy, qz, qw], axis=-1)


def get_euler_xyz(q: jnp.ndarray):
    """xyzw quaternion -> (roll, pitch, yaw), parity with isaacgym.torch_utils."""
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr_cosp = 2.0 * (qw * qx + qy * qz)
    cosr_cosp = qw * qw - qx * qx - qy * qy + qz * qz
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)

    sinp = 2.0 * (qw * qy - qz * qx)
    pitch = jnp.where(
        jnp.abs(sinp) >= 1.0,
        jnp.copysign(jnp.pi / 2.0, sinp),
        jnp.arcsin(jnp.clip(sinp, -1.0, 1.0)),
    )

    siny_cosp = 2.0 * (qw * qz + qx * qy)
    cosy_cosp = qw * qw + qx * qx - qy * qy - qz * qz
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return roll % (2 * jnp.pi), pitch % (2 * jnp.pi), yaw % (2 * jnp.pi)


def normalize_angle(x: jnp.ndarray) -> jnp.ndarray:
    """Wrap angle to [-pi, pi] (isaacgym.torch_utils.normalize_angle parity)."""
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


def quat_diff_rad(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Rotational distance in radians (torch_jit_utils.py:140-159 parity)."""
    mul = quat_mul(a, quat_conjugate(b))
    return 2.0 * jnp.arcsin(jnp.clip(jnp.linalg.norm(mul[..., :3], axis=-1), None, 1.0))


def quat_integrate(q: jnp.ndarray, omega_world: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate orientation by world angular velocity via the exp map."""
    angle = jnp.linalg.norm(omega_world, axis=-1, keepdims=True)
    axis = omega_world / jnp.clip(angle, 1e-9)
    dq = quat_from_axis_angle(axis, (angle * dt)[..., 0])
    return quat_unit(quat_mul(dq, q))


def quat_slerp(a: jnp.ndarray, b: jnp.ndarray, t) -> jnp.ndarray:
    """Spherical interpolation from a to b at fraction t in [0,1]."""
    dot = jnp.sum(a * b, axis=-1, keepdims=True)
    b = jnp.where(dot < 0.0, -b, b)
    dot = jnp.abs(dot).clip(None, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    # Fall back to lerp for tiny angles.
    w_a = jnp.where(sin_theta > 1e-6, jnp.sin((1.0 - t) * theta) / jnp.clip(sin_theta, 1e-9), 1.0 - t)
    w_b = jnp.where(sin_theta > 1e-6, jnp.sin(t * theta) / jnp.clip(sin_theta, 1e-9), t)
    return quat_unit(w_a * a + w_b * b)


# ---------------------------------------------------------------------------
# Range transforms (torch_jit_utils.py:78-134 parity)
# ---------------------------------------------------------------------------

def scale_transform(x, lower, upper):
    """Map [lower, upper] -> [-1, 1]."""
    offset = (lower + upper) * 0.5
    return 2.0 * (x - offset) / (upper - lower)


def unscale_transform(x, lower, upper):
    """Map [-1, 1] -> [lower, upper]."""
    offset = (lower + upper) * 0.5
    return x * (upper - lower) * 0.5 + offset


def saturate(x, lower, upper):
    return jnp.clip(x, lower, upper)


def local_to_world_space(pos_offset_local, pose_pos, pose_quat):
    """Transform a local point into world space (torch_jit_utils.py:162-181)."""
    return pose_pos + quat_rotate(pose_quat, pos_offset_local)
