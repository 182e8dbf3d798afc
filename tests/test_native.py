"""Native C++ component tests: geometry bindings and the URDF compiler
validated against the Python model builder on the real Bez robot."""

import ctypes
import os
import subprocess
import tempfile

import numpy as np
import pytest

from bez_isaacgym_tpu.native import bindings

pytestmark = pytest.mark.skipif(not bindings.is_available(),
                                reason="native build unavailable")


def test_cpp_unit_tests_pass():
    """Run the C++ suites (geometry gtest-style + urdf compiler)."""
    for exe in ("test_geometry", "test_urdf"):
        path = os.path.join(bindings.BUILD_DIR, exe)
        out = subprocess.run([path], capture_output=True, text=True)
        assert out.returncode == 0, out.stdout + out.stderr
        assert "0 failed" in out.stdout


def test_geometry_bindings():
    lib = bindings.geometry_lib()
    assert abs(lib.bez_point3_norm(3.0, 4.0, 4.0) - 6.4031242) < 1e-5

    a = (ctypes.c_float * 3)(1, 1, 1)
    b = (ctypes.c_float * 3)(2, 2, 2)
    assert abs(lib.bez_point3_distance(a, b) - 1.7320508) < 1e-5

    out = (ctypes.c_float * 99)()
    n = lib.bez_segment3_spaced_points(
        (ctypes.c_float * 3)(1, 1, 1), (ctypes.c_float * 3)(1, 1, 2),
        ctypes.c_float(0.1), out, 33)
    assert n == 11
    zs = [out[3 * i + 2] for i in range(11)]
    np.testing.assert_allclose(zs, 1.0 + 0.1 * np.arange(11), atol=1e-5)


def test_pose_compose_matches_scipy():
    from scipy.spatial.transform import Rotation

    lib = bindings.geometry_lib()
    rng = np.random.default_rng(3)
    for _ in range(5):
        qa = Rotation.random(random_state=rng).as_quat()
        qb = Rotation.random(random_state=rng).as_quat()
        pa, pb = rng.normal(size=3), rng.normal(size=3)
        a = (ctypes.c_float * 7)(*pa, *qa)
        b = (ctypes.c_float * 7)(*pb, *qb)
        out = (ctypes.c_float * 7)()
        lib.bez_pose3_compose(a, b, out)
        want_p = pa + Rotation.from_quat(qa).apply(pb)
        want_q = (Rotation.from_quat(qa) * Rotation.from_quat(qb)).as_quat()
        got = np.array(out[:])
        np.testing.assert_allclose(got[:3], want_p, atol=1e-5)
        sign = np.sign(np.dot(got[3:], want_q))
        np.testing.assert_allclose(got[3:], sign * want_q, atol=1e-5)


def test_native_urdf_compiler_matches_python_on_bez():
    """The C++ compiler and models/robot.py must produce identical flat
    models for the real Bez robot (JSON asset -> URDF -> native)."""
    from bez_isaacgym_tpu.models.bez import load_spec
    from bez_isaacgym_tpu.models.robot import build_robot_model

    spec = load_spec("box_sensor")
    py_model = build_robot_model(spec)

    with tempfile.NamedTemporaryFile("w", suffix=".urdf", delete=False) as f:
        f.write(spec.to_urdf())
        path = f.name
    try:
        native = bindings.compile_urdf_native(path)
    finally:
        os.unlink(path)

    assert native["nb"] == py_model.nb
    assert native["nq"] == py_model.nq
    assert native["joint_names"] == py_model.joint_names
    assert native["body_names"] == py_model.body_names
    np.testing.assert_array_equal(native["parent"], py_model.parent)
    np.testing.assert_allclose(native["tree_pos"], py_model.tree_pos, atol=1e-12)
    np.testing.assert_allclose(native["tree_rot"], py_model.tree_rot, atol=1e-12)
    np.testing.assert_allclose(native["axis"], py_model.axis, atol=1e-12)
    np.testing.assert_allclose(native["mass"], py_model.mass, atol=1e-12)
    np.testing.assert_allclose(native["com"], py_model.com, atol=1e-12)
    np.testing.assert_allclose(native["inertia"], py_model.inertia, atol=1e-12)
    np.testing.assert_allclose(native["limits"][:, 0], py_model.dof_lower, atol=1e-12)
    np.testing.assert_allclose(native["limits"][:, 2], py_model.dof_effort, atol=1e-12)
