"""Stick-figure episode renderer from FK (headless).

The reference relies on the closed-source Isaac Gym viewer
(vec_task.py:197-224, camera config bez_kick.yaml:110-113); on a headless
TPU pod we render matplotlib 3D stick figures from our own forward
kinematics and write PNG frames or an animated GIF.

    from bez_isaacgym_tpu.viz.render import render_frame, render_episode
    render_episode(model, list_of_physics_states, "episode.gif")
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from bez_isaacgym_tpu.models.robot import RobotModel  # noqa: E402
from bez_isaacgym_tpu.ops import kinematics as kin  # noqa: E402


def _skeleton(model: RobotModel, physics) -> np.ndarray:
    """(n_edges, 2, 3) world-space segments parent-com -> child-com."""
    import jax.numpy as jnp

    frames = kin.forward_kinematics(
        model, jnp.asarray(physics.q), jnp.asarray(physics.base_pos),
        jnp.asarray(physics.base_quat))
    com = np.asarray(frames.com)
    segs = []
    for b in range(1, model.nb):
        segs.append([com[int(model.parent[b])], com[b]])
    return np.asarray(segs)


_CORNER_SIGNS = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                          for sz in (-1, 1)], np.float64)
# Quad faces of a unit box in _CORNER_SIGNS index order.
_BOX_FACES = [(0, 1, 3, 2), (4, 5, 7, 6), (0, 1, 5, 4),
              (2, 3, 7, 6), (0, 2, 6, 4), (1, 3, 7, 5)]


def _box_faces_world(model: RobotModel, physics) -> list:
    """World-space quad faces of the URDF collision boxes (viz volume).

    The reference renders .obj/.dae visual meshes through the Isaac Gym
    viewer; headless we draw the collision boxes the URDF compiler already
    extracts — same silhouette, no mesh assets needed."""
    import jax.numpy as jnp

    frames = kin.forward_kinematics(
        model, jnp.asarray(physics.q), jnp.asarray(physics.base_pos),
        jnp.asarray(physics.base_quat))
    rot = np.asarray(frames.rot)
    pos = np.asarray(frames.pos)
    faces = []
    for i in range(len(model.box_body)):
        b = int(model.box_body[i])
        Rw = rot[b] @ model.box_rot[i]
        ow = pos[b] + rot[b] @ model.box_pos[i]
        corners = ow + (_CORNER_SIGNS * model.box_half[i]) @ Rw.T
        faces.extend(corners[list(f)] for f in _BOX_FACES)
    return faces


def render_frame(model: RobotModel, physics, ax=None, ball: bool = True,
                 boxes: bool = True,
                 lims=((-0.5, 1.5), (-0.75, 0.75), (0.0, 0.8))):
    """Draw one frame; returns the matplotlib axis."""
    if ax is None:
        fig = plt.figure(figsize=(6, 5))
        ax = fig.add_subplot(111, projection="3d")
    if boxes and len(model.box_body):
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection
        ax.add_collection3d(Poly3DCollection(
            _box_faces_world(model, physics), facecolors="tab:blue",
            edgecolors="none", alpha=0.18))
    segs = _skeleton(model, physics)
    for a, b in segs:
        ax.plot([a[0], b[0]], [a[1], b[1]], [a[2], b[2]], "o-",
                color="tab:blue", markersize=2, linewidth=1.5)
    if ball:
        bp = np.asarray(physics.ball_pos)
        ax.scatter([bp[0]], [bp[1]], [bp[2]], s=80, color="tab:orange")
    ax.set_xlim(*lims[0])
    ax.set_ylim(*lims[1])
    ax.set_zlim(*lims[2])
    ax.set_box_aspect((lims[0][1] - lims[0][0], lims[1][1] - lims[1][0],
                       lims[2][1] - lims[2][0]))
    return ax


def render_episode(model: RobotModel, states: list, path: str,
                   every: int = 2, fps: int = 30, ball: bool = True) -> str:
    """Render a list of PhysicsState frames to a GIF/MP4 at `path`."""
    from matplotlib.animation import FuncAnimation, PillowWriter

    frames = states[::every]
    fig = plt.figure(figsize=(6, 5))
    ax = fig.add_subplot(111, projection="3d")

    def update(i):
        ax.cla()
        render_frame(model, frames[i], ax=ax, ball=ball)
        ax.set_title(f"t = {i * every / 60:.2f} s")
        return []

    anim = FuncAnimation(fig, update, frames=len(frames))
    if path.endswith(".gif"):
        anim.save(path, writer=PillowWriter(fps=fps))
    else:
        anim.save(path, fps=fps)
    plt.close(fig)
    return path
