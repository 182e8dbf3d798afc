"""Walking-engine scenario matrix (reference parity:
pycontrol/src/soccer_pycontrol/test.py:32-175 — forward/backward/sideways/
turn/small-move scenarios, converted from watch-it-run to asserts)."""

import numpy as np
import pytest

from bez_isaacgym_tpu.control.controller import SoccerbotController
from bez_isaacgym_tpu.control.transformation import Transformation

# (name, x, y, theta) — the reference's named scenarios.
SCENARIOS = [
    ("walk_forward", 0.5, 0.0, 0.0),
    ("walk_backward", -0.5, 0.0, 0.0),
    ("walk_sideways_left", 0.0, 0.5, 0.0),
    ("walk_sideways_right", 0.0, -0.5, 0.0),
    ("turn_in_place", 0.0, 0.0, 1.5),
    ("walk_and_turn", 0.6, 0.3, 1.0),
    ("small_move_forward", 0.1, 0.0, 0.0),
    ("small_move_diag", 0.08, 0.05, 0.0),
    ("long_walk", 1.5, 0.0, 0.0),
    ("backward_turn", -0.3, -0.2, -1.0),
]


@pytest.mark.parametrize("name,x,y,theta", SCENARIOS)
def test_walk_scenario_plans(name, x, y, theta):
    """Every scenario must produce a finite, limit-respecting, smooth plan."""
    ctrl = SoccerbotController()
    goal = Transformation.from_xy_theta(x, y, theta)
    times, angles = ctrl.plan_joint_trajectory(goal)
    assert len(times) > 5, name
    assert not np.isnan(angles).any(), name
    assert np.abs(np.diff(angles, axis=0)).max() < 0.6, name
    # Leg joints stay near the URDF limits (sideways turns overshoot the
    # hip yaw by ~0.06 rad; the env's target clamp absorbs that).
    from bez_isaacgym_tpu.models.bez import load_bez_model
    model = load_bez_model("stl")
    assert np.all(angles[:, 4:10] >= model.dof_lower[4:10] - 0.1), name
    assert np.all(angles[:, 4:10] <= model.dof_upper[4:10] + 0.1), name


def test_scenario_durations_scale_with_distance():
    ctrl = SoccerbotController()
    t_short, _ = ctrl.plan_joint_trajectory(Transformation.from_xy_theta(0.5, 0, 0))
    t_long, _ = SoccerbotController().plan_joint_trajectory(
        Transformation.from_xy_theta(1.5, 0, 0))
    assert t_long[-1] > 2.0 * t_short[-1]
