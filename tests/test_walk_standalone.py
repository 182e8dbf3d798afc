"""Standalone model-based walk eval: unit tests for the approach geometry
and a slow closed-loop win check (eval/walk_standalone.py).

The reference has no counterpart for this machinery (its walk task ships no
artifact, and pycontrol's pose-to-pose tests are watch-it-run); these tests
pin the constraint-aware planning that makes the engine win the walk task's
win state (walk_env.py:943-965) where the distance-blind RL observation
cannot (runs/Bez_Walk/walk_eval.json "structural_finding").
"""

import numpy as np
import pytest

from bez_isaacgym_tpu.eval.walk_standalone import _aim_point, _plan_leg


def _bearing_diff(goal, pos):
    """The task's UNWRAPPED stray angle (tasks/walk.py:123-131)."""
    init = np.arctan2(goal[1], goal[0])
    cur = np.arctan2(goal[1] - pos[1], goal[0] - pos[0])
    return abs(init - cur)


def test_aim_point_on_init_ray_front():
    goal = np.array([0.4, 0.1])
    aim = _aim_point(goal, 0.05, 0.02)
    ray = goal / np.linalg.norm(goal)
    # stop_short before the goal, exactly on the origin->goal ray.
    assert np.allclose(aim, goal - 0.05 * ray, atol=1e-9)
    assert _bearing_diff(goal, aim) < 1e-6


def test_aim_point_safe_side_rear():
    """Rear goals get a perpendicular bias AWAY from the atan2 wrap."""
    for goal in (np.array([-0.2, 0.12]), np.array([-0.2, -0.12])):
        # bearing ~ +2.6 / -2.6 rad
        bearing = np.arctan2(goal[1], goal[0])
        assert abs(bearing) > 1.8
        aim = _aim_point(goal, 0.03, 0.02)
        # The bias must move the robot->goal bearing AWAY from +-pi:
        # |bearing(goal - aim)| must shrink, not grow.
        cur = np.arctan2(goal[1] - aim[1], goal[0] - aim[0])
        assert abs(cur) < abs(bearing) + 1e-9
        # And the unwrapped stray angle stays inside pi/2 (the bias itself
        # costs atan(offset/stop) ~ 0.59 rad, spent on the SAFE side).
        assert _bearing_diff(goal, aim) < 1.0


def test_plan_leg_minimum_turn_heading():
    """A behind-the-robot goal must be BACKED into (no in-place pi-turn):
    the plan's largest per-tick joint step stays gait-sized, and the plan
    is far shorter than a turn-around-and-walk plan would be."""
    goal = np.array([-0.15, 0.08])
    plan = _plan_leg(np.zeros(2), 0.0, goal, 0.03, 0.02)
    assert np.isfinite(plan).all()
    assert np.abs(np.diff(plan, axis=0)).max() < 0.6
    # Backward mode turns only |wrap(travel+pi)| ~ 0.5 rad instead of
    # ~2.65: the whole plan fits in ~3 s at the gait's angular speed.
    assert len(plan) < 60 * 4.0


def test_plan_leg_zero_distance_holds_ready():
    plan = _plan_leg(np.array([0.0, 0.0]), 0.0, np.array([0.012, 0.0]),
                     0.02, 0.02)
    assert plan.shape[0] == 1   # nothing to walk: single ready-pose row


@pytest.mark.slow
def test_classical_walk_wins():
    """Closed-loop: the classical engine + replanning + ankle-lean servo
    achieves the reference win state on a small env batch (the full
    64-env artifact lives at runs/Bez_Walk/standalone_walk_eval.json)."""
    from bez_isaacgym_tpu.eval.walk_standalone import eval_classical_walk

    res = eval_classical_walk(num_envs=4, seed=1, goal_range=0.45,
                              goal_range_min=0.2)
    assert res["win_rate"] >= 0.5, res
    assert res["stray_rate"] <= 0.25, res
