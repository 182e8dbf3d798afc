"""Classical control stack tests: IK, path planning, trajectories, and the
scripted-walk integration (deterministic version of the reference's
visual tests, test_kick_env.py:192-222)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bez_isaacgym_tpu.control.controller import SoccerbotController
from bez_isaacgym_tpu.control.path import Path
from bez_isaacgym_tpu.control.soccerbot import Soccerbot
from bez_isaacgym_tpu.control.trajectories import (Trajectory, available_skills,
                                                   mirror_angles)
from bez_isaacgym_tpu.control.transformation import Transformation
from bez_isaacgym_tpu.models.bez import READY_JOINT_ANGLES, Joints


def test_ready_pose_matches_reference_config():
    """IK must reproduce the task config's readyJointAngles
    (bez_kick.yaml:60-78) — those numbers came from this engine."""
    bot = Soccerbot(Transformation())
    bot.ready()
    q = bot.configuration
    assert abs(q[Joints.LEFT_LEG_3] - 0.564) < 1e-3
    assert abs(q[Joints.LEFT_LEG_4] + 1.176) < 1e-3
    assert abs(q[Joints.LEFT_LEG_5] - 0.613) < 1e-3
    assert abs(q[Joints.RIGHT_LEG_3] - 0.564) < 1e-3
    assert abs(q[Joints.RIGHT_LEG_4] + 1.176) < 1e-3
    assert abs(q[Joints.RIGHT_LEG_5] - 0.613) < 1e-3
    # Left/right symmetry for the sagittal joints.
    np.testing.assert_allclose(q[4:10][2:5], q[12:18][2:5], atol=1e-9)


def test_walk_speed_constant():
    """Long path duration = distance / 0.096 m/s (path.py:20-23)."""
    start = Transformation()
    end = Transformation.from_xy_theta(1.0, 0.0, 0.0)
    p = Path(start, end)
    assert not p.is_rotate_in_place()
    assert p.duration() == pytest.approx(p.distance / Path.speed)
    assert p.distance == pytest.approx(1.0, abs=0.02)


def test_rotate_in_place_for_short_paths():
    """Paths < 3*turn_duration*bodystep go turn/straight/turn (path.py:140-143)."""
    p = Path(Transformation(), Transformation.from_xy_theta(0.1, 0.0, 1.0))
    assert p.is_rotate_in_place()
    p2 = Path(Transformation(), Transformation.from_xy_theta(1.0, 0.0, 0.0))
    assert not p2.is_rotate_in_place()


def test_walking_backwards_detection():
    p = Path(Transformation(), Transformation.from_xy_theta(-1.0, 0.0, 0.0))
    assert p.is_walking_backwards()
    p2 = Path(Transformation(), Transformation.from_xy_theta(1.0, 0.0, 0.0))
    assert not p2.is_walking_backwards()


def test_plan_joint_trajectory_finite_and_smooth():
    ctrl = SoccerbotController()
    times, angles = ctrl.plan_joint_trajectory(
        Transformation.from_xy_theta(0.5, 0.0, 0.0))
    assert angles.shape[1] == 18
    assert not np.isnan(angles).any()
    # Continuity: no step jumps bigger than 0.5 rad at the 50 Hz grid.
    assert np.abs(np.diff(angles, axis=0)).max() < 0.5
    # Feet alternate: hip pitch oscillates.
    assert angles[:, Joints.LEFT_LEG_3].std() > 0.02


def test_foot_phase_machine_ratios():
    ctrl = SoccerbotController()
    bot = ctrl.soccerbot
    bot.ready()
    bot.set_goal(Transformation.from_xy_theta(0.5, 0.0, 0.0))
    path = bot.robot_path
    for t in np.linspace(0.0, path.duration(), 97):
        step_num, r, l = path.foot_height_ratio(t)
        assert 0.0 <= r <= 1.0 and 0.0 <= l <= 1.0
        # both feet never swing at once
        assert not (0.0 < r < 1.0 and 0.0 < l < 1.0)


def test_trajectory_endpoints_are_ready_pose():
    tr = Trajectory("simulation_rightkick")
    start = tr.angles_at(0.0)
    end = tr.angles_at(tr.max_time - 1e-6)
    ready = np.array([READY_JOINT_ANGLES[j] for j in (
        "head_motor_0", "head_motor_1",
        "left_arm_motor_0", "left_arm_motor_1",
        "left_leg_motor_0", "left_leg_motor_1", "left_leg_motor_2",
        "left_leg_motor_3", "left_leg_motor_4", "left_leg_motor_5",
        "right_arm_motor_0", "right_arm_motor_1",
        "right_leg_motor_0", "right_leg_motor_1", "right_leg_motor_2",
        "right_leg_motor_3", "right_leg_motor_4", "right_leg_motor_5")])
    np.testing.assert_allclose(start, ready, atol=1e-6)
    np.testing.assert_allclose(end, ready, atol=1e-2)


def test_all_skills_load():
    for skill in available_skills():
        tr = Trajectory(skill)
        _, arr = tr.as_array(dt=0.1)
        assert arr.shape[1] == 18
        assert not np.isnan(arr).any()


def test_mirror_involution():
    x = np.arange(18.0)
    np.testing.assert_allclose(mirror_angles(mirror_angles(x)), x)
    m = mirror_angles(x)
    np.testing.assert_allclose(m[2:4], x[10:12])   # arms swapped
    np.testing.assert_allclose(m[12:18], x[4:10])  # legs swapped
    np.testing.assert_allclose(m[0:2], x[0:2])     # head untouched


@pytest.mark.slow
def test_scripted_walk_in_simulation():
    """End-to-end: the classical walk keeps the robot upright and moves it
    toward the goal in our physics (analog of test_kick_env.py:192-204)."""
    from bez_isaacgym_tpu.tasks.base import TaskConfig
    from bez_isaacgym_tpu.tasks.walk import WalkTask

    ctrl = SoccerbotController()
    times, angles = ctrl.plan_joint_trajectory(
        Transformation.from_xy_theta(0.3, 0.0, 0.0))
    t_env = np.arange(0, times[-1], 1.0 / 60.0)
    plan = np.stack([np.interp(t_env, times, angles[:, j])
                     for j in range(18)], axis=1)

    task = WalkTask(TaskConfig(episode_length_s=10.0))
    state = task.reset_one(jax.random.PRNGKey(0))
    state = state._replace(physics=state.physics._replace(
        q=task.default_dof_pos, qd=jnp.zeros(18)))
    step = jax.jit(task.step_one)
    default = np.asarray(task.default_dof_pos)
    for target in plan:
        out = step(state, jnp.asarray(target - default, jnp.float32))
        state = out.state
    x = float(state.physics.base_pos[0])
    z = float(state.physics.base_pos[2])
    assert 0.15 < x < 0.45, x           # moved toward the 0.3 m goal
    assert z > 0.28                     # still standing
