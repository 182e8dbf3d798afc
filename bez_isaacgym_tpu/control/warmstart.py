"""MPC warm starts from the classical control stack (SURVEY.md §7 Phase 4).

Generates (S, H, nq) nominal action sequences for the MPC solvers from the
two classical generators the reference ships:

- `walk_warm_start`: the walking engine's joint plan toward per-env goals
  (path/footpath/crotchpath + closed-form IK), resampled onto the MPC grid.
- `skill_warm_start`: a keyframe skill (e.g. simulation_rightkick) resampled
  onto the MPC grid — the natural nominal for the kick task.

Actions are joint-position offsets from the ready pose, exactly what
`BezTask._pre_physics` consumes, so
`HybridSolver.warm_start(state, warm_start(...))` drops straight in.

The planners are host-side numpy (a few ms per plan); the batched output is
uploaded once per episode, not per control tick — warm starts are
trajectory-level context, refreshed at replanning cadence.
"""

from __future__ import annotations

import numpy as np

from bez_isaacgym_tpu.control.controller import SoccerbotController
from bez_isaacgym_tpu.control.trajectories import Trajectory
from bez_isaacgym_tpu.control.transformation import Transformation


def _resample(times: np.ndarray, angles: np.ndarray, horizon: int,
              dt: float, t0: float = 0.0) -> np.ndarray:
    """(H, 18) plan window starting at t0, held at the final pose after."""
    grid = t0 + dt * np.arange(horizon)
    grid = np.clip(grid, times[0], times[-1])
    return np.stack([np.interp(grid, times, angles[:, j])
                     for j in range(angles.shape[1])], axis=1)


def walk_warm_start(task, goals: np.ndarray, horizon: int,
                    dt: float = 1.0 / 60.0, t0: float = 0.0) -> np.ndarray:
    """(S, H, nq) walking-gait nominals toward per-env (x, y, theta) goals."""
    default = np.asarray(task.default_dof_pos)
    out = np.zeros((len(goals), horizon, task.num_actions), np.float32)
    for i, (x, y, theta) in enumerate(np.asarray(goals)):
        ctrl = SoccerbotController()
        times, angles = ctrl.plan_joint_trajectory(
            Transformation.from_xy_theta(float(x), float(y), float(theta)))
        out[i] = _resample(times, angles, horizon, dt, t0) - default
    return out


def skill_warm_start(task, skill: str, horizon: int,
                     dt: float = 1.0 / 60.0, t0: float = 0.0,
                     num: int = 1) -> np.ndarray:
    """(S, H, nq) keyframe-skill nominals (same plan broadcast to S envs)."""
    tr = Trajectory(skill)
    tgrid = np.arange(0.0, tr.max_time, dt)
    angles = np.stack([tr.angles_at(t) for t in tgrid])
    default = np.asarray(task.default_dof_pos)
    plan = _resample(tgrid, angles, horizon, dt, t0) - default
    return np.broadcast_to(plan.astype(np.float32),
                           (num, horizon, task.num_actions)).copy()
