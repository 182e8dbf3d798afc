"""Debug reward dashboard: the reference's live matplotlib grids, headless.

Parity with KickEnv's debug.rewards instrumentation (kick_env.py:230-238,
:586-722: 2x3 grid of kick velocity, distance kicked, goal angle diff,
up-projection, velocity/pose penalty terms) — collected per step from env 0
and written as a PNG at the end instead of a live TkAgg window.
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from bez_isaacgym_tpu.ops.quat import get_basis_vector  # noqa: E402


class KickRewardDebugger:
    """Accumulate per-step kick reward components (env 0) and plot them."""

    FIELDS = ("kick_velocity", "distance_kicked", "goal_angle_diff",
              "up_proj", "vel_reward", "pos_reward")

    def __init__(self, task):
        self.task = task
        self.history = {f: [] for f in self.FIELDS}
        self.t = []

    def record(self, state) -> None:
        """state: batched EnvState; samples env 0 (kick_env.py:630-638)."""
        import jax.numpy as jnp

        ph = state.physics
        i = 0
        ball_xy = np.asarray(ph.ball_pos[i, :2])
        ball_init = np.asarray(state.ball_init[i])
        goal = np.asarray(state.goal[i])
        progress = int(state.progress[i])
        dt = self.task.cfg.dt
        dist_kicked = float(np.linalg.norm(ball_xy - ball_init))
        t = max(progress * dt, dt)

        to_goal = goal - ball_xy
        ball_angle = np.arctan2(to_goal[1], to_goal[0])
        init_angle = np.arctan2(goal[1] - ball_init[1], goal[0] - ball_init[0])

        up = np.asarray(get_basis_vector(
            ph.base_quat[i], jnp.array([0.0, 0.0, 1.0], jnp.float32)))
        v = np.asarray(ph.base_u[i, :3])
        w = np.asarray(ph.base_u[i, 3:6])
        q = np.asarray(ph.q[i])
        default = np.asarray(self.task.default_dof_pos)

        self.t.append(progress)
        self.history["kick_velocity"].append(dist_kicked / t)
        self.history["distance_kicked"].append(dist_kicked)
        self.history["goal_angle_diff"].append(abs(init_angle - ball_angle))
        self.history["up_proj"].append(float(up[2]))
        self.history["vel_reward"].append(
            0.05 * float(np.linalg.norm(np.concatenate([v, w]))))
        self.history["pos_reward"].append(
            0.05 * float(np.linalg.norm(default - q)))

    def save(self, path: str) -> str:
        fig, axes = plt.subplots(2, 3, figsize=(12, 6), tight_layout=True)
        for ax, field in zip(axes.ravel(), self.FIELDS):
            ax.plot(self.t, self.history[field])
            ax.set_title(field)
            ax.set_xlabel("step")
            ax.grid(True, alpha=0.3)
        fig.savefig(path, dpi=100)
        plt.close(fig)
        return path
