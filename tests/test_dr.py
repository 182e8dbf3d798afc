"""Domain randomization + determinism tests (vec_task.py:505-725 parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bez_isaacgym_tpu.tasks.base import DomainRandConfig, TaskConfig
from bez_isaacgym_tpu.tasks.kick import KickTask


@pytest.fixture(scope="module")
def dr_task():
    return KickTask(TaskConfig(dr=DomainRandConfig(enabled=True)))


def test_dr_disabled_params_are_base():
    task = KickTask(TaskConfig())
    s = task.reset_one(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(s.dyn.kp), 100.0)
    np.testing.assert_allclose(np.asarray(s.dyn.mass_scale), 1.0)


def test_dr_schedule_zero_at_start(dr_task):
    """Linear schedule: no randomization at dr_scale=0
    (bez_kick.yaml:168-169: interpolate between no rand and max rand)."""
    s = dr_task.reset_one(jax.random.PRNGKey(1), dr_scale=0.0)
    np.testing.assert_allclose(np.asarray(s.dyn.mass_scale), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.dyn.kp), 100.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s.dyn.gravity),
                               [0, 0, -9.81], atol=1e-6)


def test_dr_full_scale_ranges(dr_task):
    """At dr_scale=1 samples stay within the configured ranges
    (bez_kick.yaml:173-207)."""
    keys = jax.random.split(jax.random.PRNGKey(2), 64)
    states = jax.vmap(lambda k: dr_task.reset_one(k, dr_scale=1.0))(keys)
    ms = np.asarray(states.dyn.mass_scale)
    assert ms.min() >= 0.5 - 1e-5 and ms.max() <= 1.5 + 1e-5
    assert ms.std() > 0.05  # actually randomized, per env
    kp = np.asarray(states.dyn.kp)
    assert kp.min() >= 50.0 - 1e-3 and kp.max() <= 150.0 + 1e-3


def test_determinism_same_key():
    """JAX threaded PRNG: identical keys -> identical trajectories
    (SURVEY.md §5.2)."""
    task = KickTask(TaskConfig())
    step = jax.jit(task.step_one)
    a = jnp.full((18,), 0.1, jnp.float32)
    outs = []
    for _ in range(2):
        s = task.reset_one(jax.random.PRNGKey(7))
        for _ in range(5):
            o = step(s, a)
            s = o.state
        outs.append(np.asarray(s.physics.q))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_dr_step_counter_survives_reset():
    task = KickTask(TaskConfig())
    step = jax.jit(task.step_one)
    s = task.reset_one(jax.random.PRNGKey(8))
    s = s._replace(done=jnp.asarray(True),
                   dr_step=jnp.asarray(500, jnp.int32))
    o = step(s, jnp.zeros(18, jnp.float32))
    assert int(o.state.dr_step) == 501      # clock keeps running
    assert int(o.state.progress) == 0       # episode clock reset
