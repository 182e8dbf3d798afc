"""Task layer tests: shapes, reward/termination semantics, VecEnv API."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bez_isaacgym_tpu.envs.vec_env import VecEnv
from bez_isaacgym_tpu.tasks.base import TaskConfig
from bez_isaacgym_tpu.tasks.registry import default_configs, make_task, task_map

F32 = jnp.float32


@pytest.fixture(scope="module")
def kick_task():
    return make_task("bez_kick", default_configs["bez_kick"]())


@pytest.fixture(scope="module")
def kick_step(kick_task):
    return jax.jit(kick_task.step_one)


def test_registry_parity():
    # tasks/__init__.py:10-16 + restored goalie
    assert set(task_map) == {"bez_kick", "bez_walk", "bez_orient", "bez_goalie"}


def test_obs_dims():
    # kick/goalie 54 (kick_env.py:118-120), walk/orient 52 (walk_env.py:103-105)
    dims = {"bez_kick": 54, "bez_walk": 52, "bez_orient": 52, "bez_goalie": 54}
    for name, d in dims.items():
        assert task_map[name].num_obs == d
        assert task_map[name].num_actions == 18


def test_reset_and_step_shapes(kick_task, kick_step):
    state = kick_task.reset_one(jax.random.PRNGKey(0))
    out = kick_step(state, jnp.zeros(18, F32))
    assert out.obs.shape == (54,)
    assert out.reward.shape == ()
    assert out.done.shape == ()
    assert not np.isnan(np.asarray(out.obs)).any()


def test_reset_noise_bounds(kick_task):
    """DOF reset noise is clamped noise around the ready pose
    (kick_env.py:786-791)."""
    keys = jax.random.split(jax.random.PRNGKey(1), 32)
    states = jax.vmap(kick_task.reset_one)(keys)
    q = np.asarray(states.physics.q)
    d = np.asarray(kick_task.default_dof_pos)
    assert np.all(np.abs(q - d) <= 0.15 + 1e-5)
    qd = np.asarray(states.physics.qd)
    assert np.all(np.abs(qd) <= 0.1 + 1e-6)
    # Different envs get different noise (per-env PRNG, unlike the
    # reference's shared-sample goal bug).
    assert np.std(q[:, 5]) > 0.01


def test_head_actions_zeroed(kick_task, kick_step):
    """Head joints are forced to the default pose (kick_env.py:413-414)."""
    state = kick_task.reset_one(jax.random.PRNGKey(2))
    action = jnp.zeros(18, F32).at[0].set(3.0).at[1].set(3.0)
    out = state, None
    s = state
    for _ in range(30):
        o = kick_step(s, action)
        s = o.state
    assert abs(float(s.physics.q[0])) < 0.05
    assert abs(float(s.physics.q[1])) < 0.05


def test_kick_fall_terminates(kick_task):
    """Height < 0.275 -> reward -1, reset (kick_env.py:1331-1332).
    Probes the pure reward kernel (stepping physics from a teleported state
    would bounce the robot out of penetration first)."""
    rd = jax.jit(kick_task.reward_done)
    state = kick_task.reset_one(jax.random.PRNGKey(3))
    state = state._replace(physics=state.physics._replace(
        base_pos=jnp.array([0.0, 0.0, 0.2], F32)))
    reward, done = rd(state, jnp.zeros(18, F32))
    assert bool(done)
    assert float(reward) == -1.0
    # Out-of-bound bez (> 0.5 m from start) also terminates at -1
    # (kick_env.py:1340-1349).
    state2 = kick_task.reset_one(jax.random.PRNGKey(9))
    state2 = state2._replace(physics=state2.physics._replace(
        base_pos=jnp.array([0.6, 0.0, 0.34], F32)))
    reward2, done2 = rd(state2, jnp.zeros(18, F32))
    assert bool(done2)
    assert float(reward2) == -1.0


def test_kick_scored_bonus(kick_task, kick_step):
    """Ball within 5 cm of goal -> 100*(1 - t/T) (kick_env.py:1380-1385)."""
    state = kick_task.reset_one(jax.random.PRNGKey(4))
    state = state._replace(
        physics=state.physics._replace(
            ball_pos=jnp.array([1.5, 0.0, 0.08], F32),
            ball_vel=jnp.zeros(3, F32)),
        progress=jnp.asarray(0, jnp.int32))
    out = kick_step(state, jnp.zeros(18, F32))
    assert bool(out.done)
    assert 95.0 < float(out.reward) <= 100.0


def test_walk_fall_penalty():
    task = make_task("bez_walk", default_configs["bez_walk"]())
    step = jax.jit(task.step_one)
    state = task.reset_one(jax.random.PRNGKey(5))
    # Tip the robot over: up_proj < 0.7 (walk_env.py:938-939).
    state = state._replace(physics=state.physics._replace(
        base_quat=jnp.array([0.707, 0.0, 0.0, 0.707], F32)))
    out = step(state, jnp.zeros(18, F32))
    assert bool(out.done)
    assert float(out.reward) == -100.0


def test_goalie_ball_pass_penalty():
    task = make_task("bez_goalie", default_configs["bez_goalie"]())
    step = jax.jit(task.step_one)
    state = task.reset_one(jax.random.PRNGKey(6))
    state = state._replace(physics=state.physics._replace(
        ball_pos=jnp.array([-0.5, 0.0, 0.08], F32)))
    out = step(state, jnp.zeros(18, F32))
    assert bool(out.done)
    assert float(out.reward) == -10000.0


def test_goalie_ball_arrives():
    """The -10 m/s shot actually reaches the robot (bez_goalie.yaml:17-21)."""
    task = make_task("bez_goalie", default_configs["bez_goalie"]())
    step = jax.jit(task.step_one)
    state = task.reset_one(jax.random.PRNGKey(7))
    x0 = float(state.physics.ball_pos[0])
    out = step(state, jnp.zeros(18, F32))
    x1 = float(out.state.physics.ball_pos[0])
    assert x1 < x0 - 0.1   # ball moving toward the robot fast


def test_auto_reset(kick_task, kick_step):
    """A done env is re-initialized on the next step (kick_env.py:429-435)."""
    state = kick_task.reset_one(jax.random.PRNGKey(8))
    # Simulate a big drift so the flagged env is visibly different.
    state = state._replace(
        physics=state.physics._replace(
            base_pos=jnp.array([5.0, 5.0, 0.34], F32)),
        progress=jnp.asarray(100, jnp.int32),
        done=jnp.asarray(True))
    out2 = kick_step(state, jnp.zeros(18, F32))
    pos = np.asarray(out2.state.physics.base_pos)
    assert abs(pos[0]) < 0.1 and abs(pos[1]) < 0.1   # back at the origin
    # Reference ordering: progress+=1 then reset zeroes it
    # (post_physics_step -> reset_idx, kick_env.py:429-435, :849).
    assert int(out2.state.progress) == 0
    assert not bool(out2.done)


def test_vec_env_api(kick_task):
    env = VecEnv(kick_task, num_envs=4, seed=0)
    obs = env.reset()
    assert obs.shape == (4, 54)
    obs, rew, done, info = env.step(np.zeros((4, 18), np.float32))
    assert obs.shape == (4, 54) and rew.shape == (4,)
    assert "time_outs" in info
    assert env.action_space.shape == (18,)


def test_vec_env_reset_keeps_stepped_state(kick_task):
    """Round-2 fix: reset() keeps the stepped state, so the obs returned is
    the obs the next step() continues from (vec_task.py:361-377 parity)."""
    env = VecEnv(kick_task, num_envs=2, seed=0)
    obs = env.reset()
    # The stored state is the post-step state (progress advanced to 1).
    assert np.asarray(env.state.progress).tolist() == [1, 1]
    # Stepping with zero actions from here must NOT replay the reset
    # transition: progress keeps advancing.
    env.step(np.zeros((2, 18), np.float32))
    assert np.asarray(env.state.progress).tolist() == [2, 2]
    assert obs.shape == (2, 54)
