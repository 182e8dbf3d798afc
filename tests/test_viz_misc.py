"""Tests for visualization, camera, seeding, and distributed helpers."""

import os

import jax
import numpy as np

from bez_isaacgym_tpu.control.camera import Camera
from bez_isaacgym_tpu.control.transformation import Transformation
from bez_isaacgym_tpu.utils.seeding import set_seed


def test_set_seed_returns_key():
    k = set_seed(123)
    assert np.asarray(jax.random.uniform(k)).shape == ()
    # numpy seeded deterministically
    a = np.random.rand()
    set_seed(123)
    assert np.random.rand() == a


def test_camera_projection_roundtrip():
    cam = Camera(Transformation(position=[0, 0, 0.5]))
    # A point straight ahead projects to the image center.
    px = cam.world_to_pixel([2.0, 0.0, 0.5])
    np.testing.assert_allclose(px, [320, 240], atol=1e-6)
    # Behind the camera: None.
    assert cam.world_to_pixel([-1.0, 0.0, 0.5]) is None
    # Floor intersection: pixel below center hits the ground ahead.
    ground = cam.find_floor_coordinate(320, 400)
    assert ground is not None
    assert ground[0] > 0 and abs(ground[2]) < 1e-9
    # Round trip: project the floor point back to the same pixel.
    px2 = cam.world_to_pixel(ground)
    np.testing.assert_allclose(px2, [320, 400], atol=1e-4)


def test_render_frame_and_episode(tmp_path):
    from bez_isaacgym_tpu.models.bez import (READY_JOINT_ANGLES,
                                             load_bez_model, pose_vector)
    from bez_isaacgym_tpu.ops.engine import SceneConfig, default_state
    from bez_isaacgym_tpu.viz.render import render_episode, render_frame

    model = load_bez_model("stl")
    cfg = SceneConfig()
    q0 = pose_vector(model, READY_JOINT_ANGLES)
    s = default_state(model, cfg, q0, (0, 0, 0.34), (0, 0, 0, 1))
    ax = render_frame(model, s)
    assert ax is not None
    out = render_episode(model, [s, s, s], str(tmp_path / "ep.gif"), every=1)
    assert os.path.getsize(out) > 1000


def test_visual_meshes_render():
    """Visual-mesh parity (soccerbot_stl.urdf <visual> .obj/.dae assets):
    the shipped decimated meshes cover every movable Bez link and render
    as world-space triangles through our FK."""
    from bez_isaacgym_tpu.models.bez import (READY_JOINT_ANGLES,
                                             load_bez_model, pose_vector)
    from bez_isaacgym_tpu.ops.engine import SceneConfig, default_state
    from bez_isaacgym_tpu.viz.render import _load_meshes, _mesh_polys_world

    meshes = _load_meshes()
    model = load_bez_model("stl")
    assert set(model.body_names) <= set(meshes)   # all 19 links covered
    for verts, faces in meshes.values():
        assert verts.ndim == 2 and verts.shape[1] == 3
        assert faces.max() < len(verts)
        assert len(faces) <= 450                   # stays decimated
    q0 = pose_vector(model, READY_JOINT_ANGLES)
    s = default_state(model, SceneConfig(), q0, (0, 0, 0.34), (0, 0, 0, 1))
    tris, shade = _mesh_polys_world(model, s)
    assert len(tris) == len(shade) and len(tris) > 1000
    allv = np.concatenate([np.asarray(t).reshape(-1, 3) for t in tris])
    # The posed robot's mesh cloud sits in a plausible bounding volume.
    assert allv[:, 2].min() > -0.05 and allv[:, 2].max() < 0.6
    assert np.abs(allv[:, :2]).max() < 0.5


def test_live_viewer_stream_and_keys():
    """Live viewer (reference interactive-viewer parity, vec_task.py:186-224):
    serves the index page, publishes frames over HTTP, and maps the
    QUIT / toggle-sync / pause / reset key surface onto loop flags."""
    import urllib.request

    from bez_isaacgym_tpu.models.bez import (READY_JOINT_ANGLES,
                                             load_bez_model, pose_vector)
    from bez_isaacgym_tpu.ops.engine import SceneConfig, default_state
    from bez_isaacgym_tpu.viz.live import LiveViewer

    viewer = LiveViewer(port=0, quiet=True, fps=1000.0)
    base = f"http://localhost:{viewer.port}"
    try:
        html = urllib.request.urlopen(f"{base}/", timeout=5).read()
        assert b"live viewer" in html

        # A real rendered frame lands on /frame as a JPEG.
        model = load_bez_model("stl")
        q0 = pose_vector(model, READY_JOINT_ANGLES)
        s = default_state(model, SceneConfig(), q0, (0, 0, 0.34),
                          (0, 0, 0, 1))
        assert viewer.publish(model, s, extra_title="t=0")
        jpeg = urllib.request.urlopen(f"{base}/frame", timeout=5).read()
        assert jpeg[:2] == b"\xff\xd8"  # JPEG SOI marker

        def press(k):
            urllib.request.urlopen(urllib.request.Request(
                f"{base}/key?k={k}", method="POST"), timeout=5)

        press("sync")
        assert viewer.enable_viewer_sync is False
        assert viewer.publish(model, s) is False  # sync off: no render
        press("pause")
        assert viewer.paused is True
        press("pause")
        press("reset")
        assert viewer.pop_reset() is True and viewer.pop_reset() is False
        press("quit")
        assert viewer.quit_requested is True
    finally:
        viewer.close()


def test_kick_reward_debugger(tmp_path):
    from bez_isaacgym_tpu.tasks.kick import KickTask
    from bez_isaacgym_tpu.viz.debug_rewards import KickRewardDebugger

    task = KickTask()
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    states = jax.vmap(task.reset_one)(keys)
    dbg = KickRewardDebugger(task)
    dbg.record(states)
    dbg.record(states)
    path = dbg.save(str(tmp_path / "rewards.png"))
    assert os.path.getsize(path) > 1000
    assert len(dbg.history["up_proj"]) == 2
