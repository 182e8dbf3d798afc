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


@pytest.mark.slow
def test_pressure_synced_walk():
    """Pressure-sensing walk (pycontrol test.py:177-324 analog): drive the
    gait through the physics while reading the foot-pressure sensors each
    step; the stance pattern must alternate (both-feet phases plus
    single-support phases on each side) and the pressure-feedback hook must
    keep the full per-joint force budget (soccerbot.py:511-527 returns the
    unmodified max forces)."""
    import jax
    import jax.numpy as jnp

    from bez_isaacgym_tpu.tasks.base import TaskConfig
    from bez_isaacgym_tpu.tasks.walk import WalkTask

    ctrl = SoccerbotController()
    times, angles = ctrl.plan_joint_trajectory(
        Transformation.from_xy_theta(0.3, 0.0, 0.0))
    t60 = np.arange(0, times[-1], 1 / 60)
    plan = np.stack([np.interp(t60, times, angles[:, j]) for j in range(18)],
                    axis=1)
    # cleats=True so PhysicsState.sensor_normal carries per-corner forces.
    task = WalkTask(TaskConfig(substeps=4, episode_length_s=30.0,
                               cleats=True, use_pallas=False))
    state = task.reset_one(jax.random.PRNGKey(0))
    state = state._replace(physics=state.physics._replace(
        q=task.default_dof_pos, qd=jnp.zeros(18)))
    step = jax.jit(task.step_one)
    default = np.asarray(task.default_dof_pos)

    right_on, left_on, both_on = [], [], []
    for target in plan:
        out = step(state, jnp.asarray(target - default, jnp.float32))
        state = out.state
        pressures = ctrl.soccerbot.get_foot_pressure_sensors(
            state.physics.sensor_normal)
        assert pressures.shape == (8,) and pressures.dtype == bool
        r = pressures[0:4].any()
        l = pressures[4:8].any()
        right_on.append(bool(r))
        left_on.append(bool(l))
        both_on.append(bool(r and l))
        forces = ctrl.soccerbot.apply_foot_pressure_sensor_feedback(
            state.physics.sensor_normal)
        np.testing.assert_allclose(forces, 2.5)

    # The robot stays grounded: some contact on > 90% of steps.
    grounded = np.array(right_on) | np.array(left_on)
    assert grounded.mean() > 0.9
    # Gait alternates: single-support phases occur on both sides.
    single_right = np.array(right_on) & ~np.array(left_on)
    single_left = np.array(left_on) & ~np.array(right_on)
    assert single_right.sum() > 5 and single_left.sum() > 5
    # And double-support phases exist too.
    assert np.array(both_on).sum() > 5
