"""Domain randomization + determinism tests (vec_task.py:505-725,
bez_kick.yaml:151-219 parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bez_isaacgym_tpu.tasks import dr as dr_engine
from bez_isaacgym_tpu.tasks.base import DomainRandConfig, RandSpec, TaskConfig
from bez_isaacgym_tpu.tasks.kick import KickTask


@pytest.fixture(scope="module")
def dr_task():
    return KickTask(TaskConfig(dr=DomainRandConfig(enabled=True)))


def test_dr_disabled_params_are_base():
    task = KickTask(TaskConfig())
    s = task.reset_one(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(s.dyn.kp), 100.0)
    np.testing.assert_allclose(np.asarray(s.dyn.mass_scale), 1.0)


# ---------------------------------------------------------------- sampling

def test_spec_gaussian_additive_schedule():
    """Additive gaussian: mu/std scale linearly with the schedule
    (vec_task.py:563-567)."""
    spec = RandSpec(range=(0.0, 0.4), schedule="linear", schedule_steps=3000)
    keys = jax.random.split(jax.random.PRNGKey(0), 2048)
    at0 = jax.vmap(lambda k: dr_engine.sample(k, spec, (), 0))(keys)
    at_half = jax.vmap(lambda k: dr_engine.sample(k, spec, (), 1500))(keys)
    at_full = jax.vmap(lambda k: dr_engine.sample(k, spec, (), 3000))(keys)
    np.testing.assert_allclose(np.asarray(at0), 0.0, atol=1e-7)
    assert abs(np.std(np.asarray(at_half)) - 0.2) < 0.02
    assert abs(np.std(np.asarray(at_full)) - 0.4) < 0.04
    # Past schedule_steps the scaling saturates at 1.
    at_late = jax.vmap(lambda k: dr_engine.sample(k, spec, (), 99999))(keys)
    np.testing.assert_array_equal(np.asarray(at_late), np.asarray(at_full))


def test_spec_uniform_scaling_schedule():
    """Scaling uniform: range interpolates from the identity to [lo, hi]
    (vec_task.py:601-605)."""
    spec = RandSpec(range=(0.5, 1.5), operation="scaling",
                    distribution="uniform", schedule="linear",
                    schedule_steps=3000)
    keys = jax.random.split(jax.random.PRNGKey(1), 2048)
    at0 = np.asarray(jax.vmap(
        lambda k: dr_engine.sample(k, spec, (), 0))(keys))
    np.testing.assert_allclose(at0, 1.0, atol=1e-6)
    at_half = np.asarray(jax.vmap(
        lambda k: dr_engine.sample(k, spec, (), 1500))(keys))
    assert at_half.min() >= 0.75 - 1e-5 and at_half.max() <= 1.25 + 1e-5
    at_full = np.asarray(jax.vmap(
        lambda k: dr_engine.sample(k, spec, (), 3000))(keys))
    assert at_full.min() >= 0.5 - 1e-5 and at_full.max() <= 1.5 + 1e-5
    assert at_full.std() > 0.2


def test_spec_constant_schedule():
    """Constant schedule: off before schedule_steps, full after
    (vec_task.py:558-559)."""
    spec = RandSpec(range=(0.0, 1.0), schedule="constant",
                    schedule_steps=100)
    k = jax.random.PRNGKey(2)
    before = float(dr_engine.sample(k, spec, (), 99))
    after = float(dr_engine.sample(k, spec, (), 100))
    assert before == 0.0 and abs(after) > 1e-4


def test_spec_uniform_additive():
    spec = RandSpec(range=(-0.2, 0.3), distribution="uniform")
    keys = jax.random.split(jax.random.PRNGKey(3), 2048)
    vals = np.asarray(jax.vmap(
        lambda k: dr_engine.sample(k, spec, (), 0))(keys))
    assert vals.min() >= -0.2 - 1e-6 and vals.max() <= 0.3 + 1e-6


def test_spec_correlated_noise():
    """range_correlated adds a second component (vec_task.py:584-591)."""
    spec = RandSpec(range=(0.0, 0.0), range_correlated=(0.0, 0.5))
    keys = jax.random.split(jax.random.PRNGKey(4), 1024)
    vals = np.asarray(jax.vmap(
        lambda k: dr_engine.sample(k, spec, (), 0))(keys))
    assert abs(np.std(vals) - 0.5) < 0.06


# -------------------------------------------------------------- dyn params

def test_dr_schedule_zero_at_start(dr_task):
    """Linear schedule: no randomization at dr_step=0
    (bez_kick.yaml:168-169: interpolate between no rand and max rand)."""
    s = dr_task.reset_one(jax.random.PRNGKey(1), dr_step=0)
    np.testing.assert_allclose(np.asarray(s.dyn.mass_scale), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.dyn.kp), 100.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s.dyn.gravity),
                               [0, 0, -9.81], atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.dyn.dof_lower),
                               np.asarray(dr_task.dof_lower), atol=1e-6)


def test_dr_full_scale_ranges(dr_task):
    """At dr_step >= schedule_steps samples stay within configured ranges
    (bez_kick.yaml:173-219), every randomized property."""
    keys = jax.random.split(jax.random.PRNGKey(2), 64)
    states = jax.vmap(lambda k: dr_task.reset_one(k, dr_step=3000))(keys)
    ms = np.asarray(states.dyn.mass_scale)
    assert ms.min() >= 0.5 - 1e-5 and ms.max() <= 1.5 + 1e-5
    assert ms.std() > 0.05  # actually randomized, per env
    kp = np.asarray(states.dyn.kp)
    assert kp.min() >= 50.0 - 1e-3 and kp.max() <= 150.0 + 1e-3
    kd = np.asarray(states.dyn.kd)
    assert kd.min() >= 3.75 - 1e-4 and kd.max() <= 11.25 + 1e-4
    fric = np.asarray(states.dyn.ground_friction)
    assert fric.min() >= 0.7 - 1e-5 and fric.max() <= 1.3 + 1e-5
    # dof limit noise is additive gaussian sigma=0.01.
    dlo = np.asarray(states.dyn.dof_lower) - np.asarray(dr_task.dof_lower)
    assert 0.0 < np.abs(dlo).max() < 0.06
    # gravity additive gaussian sigma=0.4 on each component.
    g = np.asarray(states.dyn.gravity)
    assert np.abs(g[:, 2] + 9.81).max() < 2.0
    assert g[:, 2].std() > 0.1


def test_dr_frequency_gating(dr_task):
    """An env resetting before `frequency` steps since its last
    randomization keeps its previous dynamics draw (vec_task.py:524-530);
    one resetting after re-randomizes (except setup_only mass)."""
    step = jax.jit(dr_task.step_one)
    s = dr_task.reset_one(jax.random.PRNGKey(5), dr_step=3000)
    kp0 = np.asarray(s.dyn.kp)
    # Reset due immediately (not yet due: dr_step - last_rand = 0 < 600).
    s_soon = s._replace(done=jnp.asarray(True))
    out = step(s_soon, jnp.zeros(18, jnp.float32))
    np.testing.assert_array_equal(np.asarray(out.state.dyn.kp), kp0)
    # Reset after the frequency elapsed: kp re-randomized, mass kept.
    mass0 = np.asarray(s.dyn.mass_scale)
    s_late = s._replace(done=jnp.asarray(True),
                        dr_step=jnp.asarray(4000, jnp.int32),
                        last_rand_step=jnp.asarray(3000, jnp.int32))
    out2 = step(s_late, jnp.zeros(18, jnp.float32))
    assert np.abs(np.asarray(out2.state.dyn.kp) - kp0).max() > 1e-3
    np.testing.assert_array_equal(np.asarray(out2.state.dyn.mass_scale),
                                  mass0)                 # setup_only
    assert int(out2.state.last_rand_step) == 4001


def test_dr_obs_action_noise_applied(dr_task):
    """obs/action white noise is on from step 0 (no schedule in the
    reference spec, bez_kick.yaml:152-158)."""
    task_plain = KickTask(TaskConfig())
    s_dr = dr_task.reset_one(jax.random.PRNGKey(6), dr_step=0)
    s_pl = task_plain.reset_one(jax.random.PRNGKey(6))
    o_dr = jax.jit(dr_task.step_one)(s_dr, jnp.zeros(18, jnp.float32))
    o_pl = jax.jit(task_plain.step_one)(s_pl, jnp.zeros(18, jnp.float32))
    # Same key, same physics start -> difference comes from DR noise.
    assert np.abs(np.asarray(o_dr.obs) - np.asarray(o_pl.obs)).max() > 1e-5


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
