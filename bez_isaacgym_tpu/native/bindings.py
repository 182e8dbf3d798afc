"""ctypes bindings for the native C++ libraries (native/).

Auto-builds via `make -C native` on first use if the shared objects are
missing (g++ is part of the toolchain; there is no pybind11 in this image,
hence ctypes).  Everything degrades gracefully: `is_available()` gates use.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
BUILD_DIR = os.path.join(NATIVE_DIR, "build")


def _ensure_built() -> bool:
    geom = os.path.join(BUILD_DIR, "libbezgeom.so")
    model = os.path.join(BUILD_DIR, "libbezmodel.so")
    if os.path.exists(geom) and os.path.exists(model):
        return True
    try:
        subprocess.run(["make", "-C", NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        return False
    return os.path.exists(geom) and os.path.exists(model)


@lru_cache(maxsize=1)
def is_available() -> bool:
    return _ensure_built()


@lru_cache(maxsize=1)
def geometry_lib() -> ctypes.CDLL:
    if not _ensure_built():
        raise RuntimeError("native geometry library unavailable (build failed)")
    lib = ctypes.CDLL(os.path.join(BUILD_DIR, "libbezgeom.so"))
    lib.bez_point3_norm.restype = ctypes.c_float
    lib.bez_point3_norm.argtypes = [ctypes.c_float] * 3
    lib.bez_point3_distance.restype = ctypes.c_float
    lib.bez_point3_distance.argtypes = [ctypes.POINTER(ctypes.c_float)] * 2
    lib.bez_segment3_spaced_points.restype = ctypes.c_int
    lib.bez_segment3_spaced_points.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_float, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.bez_pose3_compose.argtypes = [ctypes.POINTER(ctypes.c_float)] * 3
    lib.bez_pose3_inverse.argtypes = [ctypes.POINTER(ctypes.c_float)] * 2
    return lib


@lru_cache(maxsize=1)
def model_lib() -> ctypes.CDLL:
    if not _ensure_built():
        raise RuntimeError("native model library unavailable (build failed)")
    lib = ctypes.CDLL(os.path.join(BUILD_DIR, "libbezmodel.so"))
    lib.bez_compile_urdf.restype = ctypes.c_int
    lib.bez_compile_urdf.argtypes = [ctypes.c_char_p]
    for name in ("tree_pos", "tree_rot", "axis", "mass", "com", "inertia",
                 "limits"):
        fn = getattr(lib, f"bez_model_{name}")
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.POINTER(ctypes.c_double)]
    lib.bez_model_parent.restype = ctypes.c_int
    lib.bez_model_parent.argtypes = [ctypes.POINTER(ctypes.c_int)]
    lib.bez_model_nq.restype = ctypes.c_int
    for name in ("joint_names", "body_names"):
        fn = getattr(lib, f"bez_model_{name}")
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_char_p, ctypes.c_int]
    return lib


def compile_urdf_native(path: str) -> dict:
    """Run the native URDF compiler; returns the flat model arrays.

    Native analog of Isaac Gym's `gym.load_asset` (kick_env.py:302); output
    layout matches models/robot.py::build_robot_model's kinematic/inertial
    fields.
    """
    import numpy as np

    lib = model_lib()
    nb = lib.bez_compile_urdf(path.encode())
    if nb <= 0:
        raise ValueError(f"native URDF compile failed for {path}")
    nq = lib.bez_model_nq()

    def fetch(name, shape):
        buf = np.zeros(int(np.prod(shape)), np.float64)
        getattr(lib, f"bez_model_{name}")(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return buf.reshape(shape)

    parent = np.zeros(nb, np.int32)
    lib.bez_model_parent(parent.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    names = ctypes.create_string_buffer(4096)
    lib.bez_model_joint_names(names, len(names))
    joint_names = names.value.decode().split(";") if nq else []
    lib.bez_model_body_names(names, len(names))
    body_names = names.value.decode().split(";")

    return {
        "nb": nb, "nq": nq, "parent": parent,
        "tree_pos": fetch("tree_pos", (nb, 3)),
        "tree_rot": fetch("tree_rot", (nb, 3, 3)),
        "axis": fetch("axis", (nq, 3)),
        "mass": fetch("mass", (nb,)),
        "com": fetch("com", (nb, 3)),
        "inertia": fetch("inertia", (nb, 3, 3)),
        "limits": fetch("limits", (nq, 4)),
        "joint_names": joint_names,
        "body_names": body_names,
    }
