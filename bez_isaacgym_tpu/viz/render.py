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


_MESHES = None


def _load_meshes():
    """Decimated visual meshes (assets/meshes.npz, tools/extract_meshes.py):
    {link_name: (verts (V,3) link-frame, faces (F,3))}. None if absent."""
    global _MESHES
    if _MESHES is None:
        import os
        path = os.path.join(os.path.dirname(__file__), "..", "assets",
                            "meshes.npz")
        if not os.path.exists(path):
            _MESHES = {}
        else:
            z = np.load(path)
            names = sorted({k.rsplit(":", 1)[0] for k in z.files})
            _MESHES = {n: (z[f"{n}:verts"], z[f"{n}:faces"]) for n in names}
    return _MESHES


def _mesh_polys_world(model: RobotModel, physics):
    """(tri_list, shade) — world-space visual-mesh triangles + flat shading.

    The reference renders per-link .obj/.dae visual meshes through the Isaac
    Gym viewer (soccerbot_stl.urdf <visual>); we transform the decimated
    copies through our FK and light them with a fixed directional lambert.
    """
    import jax.numpy as jnp

    meshes = _load_meshes()
    if not meshes:
        return [], []
    frames = kin.forward_kinematics(
        model, jnp.asarray(physics.q), jnp.asarray(physics.base_pos),
        jnp.asarray(physics.base_quat))
    rot = np.asarray(frames.rot)
    pos = np.asarray(frames.pos)
    light = np.array([0.45, 0.3, 0.85])
    light /= np.linalg.norm(light)
    tris, shade = [], []
    for name, (verts, faces) in meshes.items():
        if name not in model.body_names:
            continue          # fixed link merged away in this variant
        b = model.body_index(name)
        w = verts @ rot[b].T + pos[b]
        t = w[faces]                                   # (F, 3, 3)
        n = np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0])
        n /= np.linalg.norm(n, axis=1, keepdims=True) + 1e-12
        tris.append(t)
        shade.append(0.35 + 0.65 * np.abs(n @ light))
    return (list(np.concatenate(tris, 0)) if tris else [],
            np.concatenate(shade, 0) if shade else [])


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
                 boxes: bool = True, meshes: bool = True,
                 lims=((-0.5, 1.5), (-0.75, 0.75), (0.0, 0.8))):
    """Draw one frame; returns the matplotlib axis.

    meshes=True draws the decimated visual meshes (reference parity:
    soccerbot_stl.urdf <visual> .obj/.dae assets) when any of this model's
    links have extracted geometry; collision boxes remain the fallback
    silhouette for box-only variants."""
    if ax is None:
        fig = plt.figure(figsize=(6, 5))
        ax = fig.add_subplot(111, projection="3d")
    drew_mesh = False
    if meshes:
        tris, shade = _mesh_polys_world(model, physics)
        if tris:
            from mpl_toolkits.mplot3d.art3d import Poly3DCollection
            base = np.array([0.19, 0.42, 0.74])
            cols = np.clip(shade[:, None] * base[None], 0, 1)
            ax.add_collection3d(Poly3DCollection(
                tris, facecolors=cols, edgecolors="none"))
            drew_mesh = True
    if boxes and not drew_mesh and len(model.box_body):
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection
        ax.add_collection3d(Poly3DCollection(
            _box_faces_world(model, physics), facecolors="tab:blue",
            edgecolors="none", alpha=0.18))
    if not drew_mesh:
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
