"""Quaternion/rotation math unit tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from bez_isaacgym_tpu.ops import quat as _Q


class _Jitted:
    """Jit-wrapping proxy: one cacheable XLA program per op (XLA:CPU eager
    per-op compiles are pathologically slow on this image)."""

    def __getattr__(self, name):
        fn = getattr(_Q, name)
        cached = jax.jit(fn)
        setattr(self, name, cached)
        return cached


Q = _Jitted()

RNG = np.random.default_rng(0)


def random_quats(n):
    q = RNG.normal(size=(n, 4))
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


def test_quat_mul_matches_scipy():
    a, b = random_quats(32), random_quats(32)
    got = np.asarray(Q.quat_mul(jnp.asarray(a), jnp.asarray(b)))
    want = (Rotation.from_quat(a) * Rotation.from_quat(b)).as_quat()
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, sign * want, atol=1e-5)


def test_quat_rotate_matches_matrix():
    q = random_quats(32)
    v = RNG.normal(size=(32, 3)).astype(np.float32)
    got = np.asarray(Q.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    want = np.einsum("nij,nj->ni", Rotation.from_quat(q).as_matrix(), v)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quat_to_matrix_roundtrip():
    q = random_quats(64)
    m = np.asarray(Q.quat_to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(m, Rotation.from_quat(q).as_matrix(), atol=1e-5)
    back = np.asarray(Q.matrix_to_quat(jnp.asarray(m)))
    sign = np.sign(np.sum(back * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(back, sign * q, atol=1e-4)


def test_rotate_inverse_is_inverse():
    q = random_quats(8)
    v = RNG.normal(size=(8, 3)).astype(np.float32)
    w = Q.quat_rotate_inverse(jnp.asarray(q), Q.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    np.testing.assert_allclose(np.asarray(w), v, atol=1e-5)


def test_euler_roundtrip():
    rpy = RNG.uniform(-1.2, 1.2, size=(32, 3)).astype(np.float32)
    q = Q.quat_from_euler_xyz(jnp.asarray(rpy[:, 0]), jnp.asarray(rpy[:, 1]),
                              jnp.asarray(rpy[:, 2]))
    r, p, y = Q.get_euler_xyz(q)
    got = np.stack([np.asarray(Q.normalize_angle(r)),
                    np.asarray(Q.normalize_angle(p)),
                    np.asarray(Q.normalize_angle(y))], axis=-1)
    np.testing.assert_allclose(got, rpy, atol=1e-4)


def test_quat_integrate_constant_rate():
    q = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    w = jnp.asarray([0.0, 0.0, np.pi])  # half turn per second around z
    for _ in range(100):
        q = Q.quat_integrate(q, w, 0.01)
    yaw = np.asarray(Q.get_euler_xyz(q)[2])
    assert abs(Q.normalize_angle(yaw - np.pi)) < 1e-3


def test_quat_diff_rad():
    a = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    b = Q.quat_from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(0.3))
    assert abs(float(Q.quat_diff_rad(a, b)) - 0.3) < 1e-5


def test_scale_unscale_roundtrip():
    lo = jnp.asarray([-1.0, 0.0, -2.0])
    hi = jnp.asarray([1.0, 2.0, 0.5])
    x = jnp.asarray([0.3, 1.2, -1.0])
    np.testing.assert_allclose(
        np.asarray(Q.unscale_transform(Q.scale_transform(x, lo, hi), lo, hi)),
        np.asarray(x), atol=1e-6)


def test_slerp_endpoints():
    a, b = map(jnp.asarray, random_quats(2))
    for t, ref in ((0.0, a), (1.0, b)):
        got = np.asarray(Q.quat_slerp(a, b, t))
        ref = np.asarray(ref)
        sign = np.sign(np.sum(got * ref))
        np.testing.assert_allclose(got, sign * ref, atol=1e-5)
