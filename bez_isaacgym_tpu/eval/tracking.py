"""Trajectory tracking evaluation (BASELINE.md: <2% tracking error target).

Two oracles, both derived from the reference's own control stack:
1. kick-skill joint tracking: play the simulation_rightkick keyframe skill
   through the physics and measure joint-space RMS error relative to the
   commanded range (the reference's analog: test_kick_env.py:210-222).
2. classical-walk tracking: drive the walking engine's plan and measure
   both joint RMS error and final base-position error vs the commanded goal
   (the reference's analog: test_kick_env.py:192-204).

Run:  python -m bez_isaacgym_tpu.eval.tracking
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from bez_isaacgym_tpu.control.controller import SoccerbotController
from bez_isaacgym_tpu.control.trajectories import Trajectory
from bez_isaacgym_tpu.control.transformation import Transformation
from bez_isaacgym_tpu.tasks.base import TaskConfig
from bez_isaacgym_tpu.tasks.kick import KickTask
from bez_isaacgym_tpu.tasks.walk import WalkTask

F32 = jnp.float32


def _drive(task, plan_60hz: np.ndarray, record_every: int = 1):
    """Feed a (T,18) joint-target plan into the env; return achieved (T,18)."""
    state = task.reset_one(jax.random.PRNGKey(0))
    state = state._replace(physics=state.physics._replace(
        q=task.default_dof_pos, qd=jnp.zeros(18)))
    step = jax.jit(task.step_one)
    default = np.asarray(task.default_dof_pos)
    achieved = np.zeros_like(plan_60hz)
    for i, target in enumerate(plan_60hz):
        out = step(state, jnp.asarray(target - default, F32))
        state = out.state
        achieved[i] = np.asarray(state.physics.q)
    return achieved, state


def kick_skill_tracking() -> dict:
    """Joint tracking of the rightkick keyframe skill."""
    tr = Trajectory("simulation_rightkick")
    t60 = np.arange(0.0, tr.max_time, 1 / 60)
    plan = np.stack([tr.angles_at(t) for t in t60])
    task = KickTask(TaskConfig(substeps=4))
    achieved, _ = _drive(task, plan)
    # One-step actuation delay: compare achieved[i] to command[i-1].
    err = achieved[1:] - plan[:-1]
    joint_range = plan.max(0) - plan.min(0) + 1e-6
    rms = np.sqrt((err ** 2).mean(0))
    # Error for commanded joints relative to their commanded range.
    moving = joint_range > 0.05
    rel = (rms[moving] / joint_range[moving]).mean()
    return {"kick_joint_rms_rad": float(rms.mean()),
            "kick_rel_tracking_err": float(rel)}


def walk_tracking(goal_x: float = 0.5) -> dict:
    """Classical walk: joint tracking + final base position error."""
    ctrl = SoccerbotController()
    times, angles = ctrl.plan_joint_trajectory(
        Transformation.from_xy_theta(goal_x, 0.0, 0.0))
    t60 = np.arange(0, times[-1], 1 / 60)
    plan = np.stack([np.interp(t60, times, angles[:, j]) for j in range(18)],
                    axis=1)
    task = WalkTask(TaskConfig(substeps=4, episode_length_s=30.0))
    achieved, state = _drive(task, plan)
    err = achieved[1:] - plan[:-1]
    joint_range = plan.max(0) - plan.min(0) + 1e-6
    rms = np.sqrt((err ** 2).mean(0))
    moving = joint_range > 0.05
    rel = (rms[moving] / joint_range[moving]).mean()
    final_x = float(state.physics.base_pos[0])
    return {
        "walk_joint_rms_rad": float(rms.mean()),
        "walk_rel_tracking_err": float(rel),
        "walk_goal_x_m": goal_x,
        "walk_final_x_m": final_x,
        "walk_position_err_frac": abs(final_x - goal_x) / goal_x,
        "walk_final_height_m": float(state.physics.base_pos[2]),
    }


def main():
    out = {}
    out.update(kick_skill_tracking())
    out.update(walk_tracking())
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
