"""Sensor model parity tests (reference kernels: kick_env.py:888-1069)."""

import jax
import jax.numpy as jnp
import numpy as np

from bez_isaacgym_tpu.ops import sensors
from bez_isaacgym_tpu.tasks.orient import compute_off_angle

F32 = jnp.float32


def test_imu_stationary_upright():
    """At rest: lin_acc = -gravity_vec = +1 z (unit, NOT 9.81 — reference
    quirk kick_env.py:917-920); ang vel zero."""
    imu, prev = sensors.compute_imu(
        jnp.array([0, 0, 0, 1], F32), jnp.zeros(3, F32), jnp.zeros(3, F32),
        jnp.zeros(3, F32), 1 / 60)
    np.testing.assert_allclose(np.asarray(imu), [0, 0, 1, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(prev), 0.0)


def test_imu_quirk_rotation_matches_reference_formula():
    """The IMU rotation feeds xyzw into a wxyz formula (kick_env.py:857-885,
    :922).  Check against a literal numpy transcription of that math."""
    rng = np.random.default_rng(5)
    q = rng.normal(size=4).astype(np.float32)
    q /= np.linalg.norm(q)
    vel = rng.normal(size=3).astype(np.float32)
    prev = rng.normal(size=3).astype(np.float32)
    dt = 1 / 60

    # Literal reference math (r,i,j,k bound to x,y,z,w of the xyzw quat).
    r, i, j, k = q
    two_s = 2.0 / np.dot(q, q)
    R = np.array([
        [1 - two_s * (j * j + k * k), two_s * (i * j - k * r), two_s * (i * k + j * r)],
        [two_s * (i * j + k * r), 1 - two_s * (i * i + k * k), two_s * (j * k - i * r)],
        [two_s * (i * k - j * r), two_s * (j * k + i * r), 1 - two_s * (i * i + j * j)],
    ])
    lin_acc = (vel - prev) / dt - np.array([0.0, 0.0, -1.0])
    want = np.clip(R @ lin_acc, -sensors.IMU_MAX_LIN_ACC,
                   sensors.IMU_MAX_LIN_ACC)

    imu, _ = sensors.compute_imu(jnp.asarray(q), jnp.asarray(vel),
                                 jnp.zeros(3, F32), jnp.asarray(prev), dt)
    np.testing.assert_allclose(np.asarray(imu[:3]), want, atol=1e-4)


def test_imu_clipping():
    imu, _ = sensors.compute_imu(
        jnp.array([0, 0, 0, 1], F32), jnp.array([100.0, 0, 0], F32),
        jnp.array([100.0, 0, 0], F32), jnp.zeros(3, F32), 1 / 60)
    assert abs(float(imu[0])) <= sensors.IMU_MAX_LIN_ACC + 1e-5
    assert abs(float(imu[3]) - sensors.IMU_MAX_ANG_VEL) < 1e-5


def test_off_orn_geometry():
    """vec = (sin, -cos) of heading-to-goal angle (kick_env.py:933-962)."""
    pos = jnp.zeros(3, F32)
    quat = jnp.array([0, 0, 0, 1], F32)  # facing +x
    # Goal straight ahead: cos=1, sin=0 -> (0,-1).
    v = sensors.compute_off_orn(pos, quat, jnp.array([1.0, 0.0], F32))
    np.testing.assert_allclose(np.asarray(v), [0.0, -1.0], atol=1e-6)
    # Goal to the left (+y): cos=0, sin=1 -> (1, 0).
    v = sensors.compute_off_orn(pos, quat, jnp.array([0.0, 1.0], F32))
    np.testing.assert_allclose(np.asarray(v), [1.0, 0.0], atol=1e-6)
    # Goal behind: cos=-1, sin=0 -> (0, 1).
    v = sensors.compute_off_orn(pos, quat, jnp.array([-1.0, 0.0], F32))
    np.testing.assert_allclose(np.asarray(v), [0.0, 1.0], atol=1e-6)


def test_off_angle():
    """(cos,sin) of goal_angle - yaw (orient_env.py:719-733)."""
    quat = jnp.array([0, 0, 0, 1], F32)
    vec, diff = compute_off_angle(quat, jnp.asarray(np.pi / 2, F32))
    np.testing.assert_allclose(np.asarray(vec), [0.0, 1.0], atol=1e-6)
    assert abs(float(diff) - np.pi / 2) < 1e-6


def test_feet_cleats_threshold():
    """norm > 1 N -> 1 else -1 (kick_env.py:1053-1061)."""
    forces = jnp.array([0.0, 1.5, 0.99, 30.0, 0.0, 0.0, 1.01, 0.5], F32)
    out = np.asarray(sensors.feet_sensors_cleats(forces))
    np.testing.assert_array_equal(out, [-1, 1, -1, 1, -1, -1, 1, -1])


def test_feet_case_table():
    """Actual (zero/nonzero) semantics of the no-cleats case table
    (kick_env.py:966-1040) — cases 1, 3, 9, 11, 12."""
    def f(force):
        return np.asarray(sensors._foot_case_table(jnp.asarray(force, F32)))

    # fz < 1 N: all corners off (case 12).
    np.testing.assert_array_equal(f([5.0, 5.0, 0.5]), [-1, -1, -1, -1])
    # fx!=0, fy!=0 (case 1).
    np.testing.assert_array_equal(f([2.0, 2.0, 10.0]), [1, -1, -1, -1])
    # fx!=0, fy==0 (case 3).
    np.testing.assert_array_equal(f([2.0, 0.0, 10.0]), [1, -1, 1, -1])
    # fx==0, fy!=0 (case 9).
    np.testing.assert_array_equal(f([0.0, 2.0, 10.0]), [1, 1, -1, -1])
    # fx==0, fy==0 (case 11): pure normal load.
    np.testing.assert_array_equal(f([0.0, 0.0, 10.0]), [1, 1, 1, 1])
    # Sub-threshold noise filtered to zero (|f| <= 0.01).
    np.testing.assert_array_equal(f([0.005, 0.009, 10.0]), [1, 1, 1, 1])


def test_feet_no_cleats_concat_order():
    out = np.asarray(sensors.feet_sensors_no_cleats(
        jnp.array([0.0, 0.0, 10.0], F32), jnp.array([2.0, 2.0, 10.0], F32)))
    np.testing.assert_array_equal(out[:4], [1, 1, 1, 1])     # left
    np.testing.assert_array_equal(out[4:], [1, -1, -1, -1])  # right
